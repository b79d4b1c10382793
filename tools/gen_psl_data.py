"""Generate ``airflow_kafka_spark_spark/ext/psl_data.py`` from a Public
Suffix List snapshot (publicsuffix.org — public data, MPL 2.0; Debian
ships a copy at /usr/share/publicsuffix/public_suffix_list.dat).

The engine's registered-domain machinery (``ext/dedup.py``,
``url_dedup_domain_cap``) is three broadcast lookups: 2-label suffixes
(domain = last 3 labels), 3-label suffixes (domain = last 4),
single-label wildcard TLDs (domain = last 3), plus a 2-label exception
tier checked first. This script extracts exactly the rules those tiers
can express and records a census of the shapes they cannot (4/5-label
plain rules, multi-label wildcard bases and their exceptions) so the
out-of-scope surface is a printed number, not a guess.

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

    s2: set[str] = set()
    s3: set[str] = set()
    wild1: set[str] = set()
    exc2: set[str] = set()
    out_of_scope: Counter = Counter()
    for r in rules:
        if r.startswith("!"):
            body = r[1:]
            if body.count(".") == 1:
                exc2.add(body)
            else:
                out_of_scope[f"exception_{body.count('.') + 1}_label"] += 1
            continue
        if r.startswith("*."):
            base = r[2:]
            nb = base.count(".") + 1
            if nb == 1:
                wild1.add(base)
            elif nb in (2, 3):
                # DOWN-PROJECTION: a multi-label wildcard base ``*.B``
                # (the ``*.sch.uk`` / ``*.compute.amazonaws.com`` class)
                # true rule makes <label>.B the suffix (registered
                # domain = last len(B)+2 labels). The engine has no
                # per-wildcard-base tier, so B is bundled as a PLAIN
                # suffix of its own label count: registered domain =
                # last len(B)+1 labels — exactly one level coarser than
                # the true rule for deep hosts, identical for hosts at
                # or one label under B, and never coarser than the
                # last-2-labels default that ignoring the rule would
                # give. This also subsumes the ``!city.kawasaki.jp``
                # exception class at its own depth: the exception host
                # and everything one label under it already resolve to
                # the exception host.
                (s2 if nb == 2 else s3).add(base)
                puny = _punycode(base)
                if puny:
                    (s2 if nb == 2 else s3).add(puny)
                out_of_scope[f"wildcard_base_{nb}_label_downprojected"] += 1
            else:
                out_of_scope[f"wildcard_base_{nb}_label"] += 1
            continue
        n = r.count(".") + 1
        if n == 1:
            # single-label suffixes need no table: the last-two-labels
            # default already yields the registered domain under them
            continue
        target = s2 if n == 2 else s3 if n == 3 else None
        if target is None:
            out_of_scope[f"plain_{n}_label"] += 1
            continue
        target.add(r)
        puny = _punycode(r)
        if puny:
            target.add(puny)
    return version, sorted(s2), sorted(s3), sorted(wild1), sorted(exc2), out_of_scope


def emit(version, s2, s3, wild1, exc2, oos, out_path):
    def tup(name, vals):
        body = "\n".join(f"    {v!r}," for v in vals)
        return f"{name} = (\n{body}\n)\n"

    header = f'''"""Public Suffix List snapshot, generated — do not edit by hand.

Source: publicsuffix.org (public data, MPL 2.0), via the OS-packaged
copy of public_suffix_list.dat; regenerate with
``python tools/gen_psl_data.py``. Snapshot VERSION: {version}.

Contents (ICANN + PRIVATE sections merged — the registered-domain
lookup treats them identically; IDN rules appear in unicode AND
punycode forms):

- ``PSL_SUFFIXES_2`` ({len(s2)}): 2-label public suffixes — registered
  domain under them is the last THREE labels.
- ``PSL_SUFFIXES_3`` ({len(s3)}): 3-label public suffixes — last FOUR.
- ``PSL_WILDCARD_TLDS`` ({len(wild1)}): ``*.<tld>`` single-label
  wildcard bases — every label directly under them is itself a public
  suffix (registered domain = last three labels).
- ``PSL_WILDCARD_EXCEPTIONS_2`` ({len(exc2)}): ``!host.tld`` carve-outs
  checked before every other tier.

Rules the tiers cannot express EXACTLY, counted at generation time so
the gap is a census, not a guess: {dict(sorted(oos.items()))!r}.
Keys ending ``_downprojected`` are APPROXIMATED (the multi-label
wildcard base is bundled as a plain suffix of its own label count —
one level coarser than the true rule, see tools/gen_psl_data.py);
that approximation also covers the 3-label exceptions at their own
depth. The rest are dropped: 4/5-label plain rules would need
last-5/6-label tiers; see ext/dedup.py's tier commentary.
"""

'''
    out = header
    out += tup("PSL_SUFFIXES_2", s2) + "\n"
    out += tup("PSL_SUFFIXES_3", s3) + "\n"
    out += tup("PSL_WILDCARD_TLDS", wild1) + "\n"
    out += tup("PSL_WILDCARD_EXCEPTIONS_2", exc2) + "\n"
    out += f"PSL_OUT_OF_SCOPE_COUNTS = {dict(sorted(oos.items()))!r}\n"
    out += f"PSL_VERSION = {version!r}\n"
    Path(out_path).write_text(out, encoding="utf-8")
    print(
        f"wrote {out_path}: s2={len(s2)} s3={len(s3)} wild1={len(wild1)} "
        f"exc2={len(exc2)} out_of_scope={sum(oos.values())} version={version}"
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    parsed = parse(src)
    if len(sys.argv) > 3:
        parsed = (sys.argv[3],) + parsed[1:]
    emit(*parsed, out)
