"""Generate ``airflow_kafka_spark_spark/ext/psl_data.py`` from a Public
Suffix List snapshot (publicsuffix.org — public data, MPL 2.0; Debian
ships a copy at /usr/share/publicsuffix/public_suffix_list.dat).

The engine's registered-domain machinery (``ext/dedup.py``,
``url_dedup_domain_cap``) expresses the FULL PSL algorithm as tiered
broadcast lookups, longest matched rule first:

- plain k-label suffixes for k in 2..5 (registered domain = last k+1
  labels; single-label suffixes need no table — the last-two-labels
  default already yields the registered domain under them);
- wildcard bases ``*.B`` for len(B) in 1..4 (every label directly
  under B is itself a public suffix; registered domain = last
  len(B)+2 labels);
- exception rules ``!X`` at depths 2 and 3 (X itself is the
  registered domain), checked before every other tier.

This script extracts every rule into those shapes and records a census
of anything deeper (none in current snapshots) so the out-of-scope
surface is a printed number, not a guess.

IDN rules (the PSL stores U-labels) are emitted in BOTH the unicode
form and the per-label punycode (A-label) form when IDNA encoding
succeeds — hosts arrive on the wire in either. Output is sorted and
deduplicated, so regeneration from the same snapshot is byte-stable.

Usage: python tools/gen_psl_data.py [src.dat] [out.py] [version]
(the upstream .dat has no VERSION header; pass the OS package version —
e.g. ``dpkg -s publicsuffix`` — so the snapshot is identifiable)
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

DEFAULT_SRC = "/usr/share/publicsuffix/public_suffix_list.dat"
DEFAULT_OUT = (
    Path(__file__).resolve().parents[1]
    / "airflow_kafka_spark_spark"
    / "ext"
    / "psl_data.py"
)

MAX_PLAIN = 5  # plain suffix tiers 2..5 (last-(k+1)-labels joins)
MAX_WILD = 4  # wildcard base tiers 1..4
MAX_EXC = 3  # exception tiers 2..3


def _punycode(rule: str) -> str | None:
    """Per-label IDNA (A-label) form, or None when a label won't encode
    (stdlib IDNA2003 rejects a few modern labels — those rules still
    ship in their unicode form)."""
    try:
        enc = ".".join(
            lbl.encode("idna").decode("ascii") for lbl in rule.split(".")
        )
    except UnicodeError:
        return None
    return enc if enc != rule else None


def _add(target: set[str], rule: str) -> None:
    target.add(rule)
    puny = _punycode(rule)
    if puny:
        target.add(puny)


def parse(src: str):
    rules: list[str] = []
    version = "unknown"
    for line in open(src, encoding="utf-8"):
        line = line.strip()
        if line.startswith("// VERSION:"):
            version = line.split(":", 1)[1].strip()
        if not line or line.startswith("//"):
            continue
        rules.append(line.lower())

    plain: dict[int, set[str]] = {k: set() for k in range(2, MAX_PLAIN + 1)}
    wild: dict[int, set[str]] = {k: set() for k in range(1, MAX_WILD + 1)}
    exc: dict[int, set[str]] = {k: set() for k in range(2, MAX_EXC + 1)}
    out_of_scope: Counter = Counter()
    for r in rules:
        if r.startswith("!"):
            body = r[1:]
            n = body.count(".") + 1
            if n in exc:
                _add(exc[n], body)
            else:
                out_of_scope[f"exception_{n}_label"] += 1
            continue
        if r.startswith("*."):
            base = r[2:]
            nb = base.count(".") + 1
            if nb in wild:
                _add(wild[nb], base)
            else:
                out_of_scope[f"wildcard_base_{nb}_label"] += 1
            continue
        n = r.count(".") + 1
        if n == 1:
            # single-label suffixes need no table: the last-two-labels
            # default already yields the registered domain under them
            continue
        if n in plain:
            _add(plain[n], r)
        else:
            out_of_scope[f"plain_{n}_label"] += 1
    return (
        version,
        {k: sorted(v) for k, v in plain.items()},
        {k: sorted(v) for k, v in wild.items()},
        {k: sorted(v) for k, v in exc.items()},
        out_of_scope,
    )


def emit(version, plain, wild, exc, oos, out_path):
    def tup(name, vals):
        body = "\n".join(f"    {v!r}," for v in vals)
        return f"{name} = (\n{body}\n)\n" if vals else f"{name} = ()\n"

    sizes = ", ".join(
        [f"plain{k}={len(plain[k])}" for k in sorted(plain)]
        + [f"wild{k}={len(wild[k])}" for k in sorted(wild)]
        + [f"exc{k}={len(exc[k])}" for k in sorted(exc)]
    )
    header = f'''"""Public Suffix List snapshot, generated — do not edit by hand.

Source: publicsuffix.org (public data, MPL 2.0), via the OS-packaged
copy of public_suffix_list.dat; regenerate with
``python tools/gen_psl_data.py``. Snapshot VERSION: {version}.

Contents (ICANN + PRIVATE sections merged — the registered-domain
lookup treats them identically; IDN rules appear in unicode AND
punycode forms): {sizes}.

- ``PSL_SUFFIXES_k`` (k in 2..5): plain k-label public suffixes —
  registered domain under them is the last k+1 labels.
- ``PSL_WILDCARD_TLDS`` / ``PSL_WILDCARD_BASES_k`` (k in 2..4):
  ``*.B`` wildcard bases by base label count — every label directly
  under B is itself a public suffix (registered domain = last
  len(B)+2 labels).
- ``PSL_WILDCARD_EXCEPTIONS_2/3``: ``!host`` carve-outs (the host IS
  the registered domain), checked before every other tier.

Rules the tiers cannot express, counted at generation time so the gap
is a census, not a guess: {dict(sorted(oos.items()))!r}.
"""

'''
    out = header
    for k in sorted(plain):
        out += tup(f"PSL_SUFFIXES_{k}", plain[k]) + "\n"
    out += tup("PSL_WILDCARD_TLDS", wild[1]) + "\n"
    for k in sorted(wild):
        if k >= 2:
            out += tup(f"PSL_WILDCARD_BASES_{k}", wild[k]) + "\n"
    for k in sorted(exc):
        out += tup(f"PSL_WILDCARD_EXCEPTIONS_{k}", exc[k]) + "\n"
    out += f"PSL_OUT_OF_SCOPE_COUNTS = {dict(sorted(oos.items()))!r}\n"
    out += f"PSL_VERSION = {version!r}\n"
    Path(out_path).write_text(out, encoding="utf-8")
    print(f"wrote {out_path}: {sizes} out_of_scope={sum(oos.values())} version={version}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    parsed = parse(src)
    if len(sys.argv) > 3:
        parsed = (sys.argv[3],) + parsed[1:]
    emit(*parsed, out)
