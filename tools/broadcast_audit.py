"""Catalog-wide corpus-broadcast audit (the round-8 sweep, repeatable).

Explains every catalog entry at a small SF (where statistics are tiny
and AQE is most broadcast-happy), parses each BroadcastExchange
subtree out of the simple-mode plan string, and flags any subtree that
contains a fact/corpus-table scan with no bounding operator above it.

A flag is a CANDIDATE, not a verdict — triage each one:

- 1-row IdentityBroadcastMode aggregates (count crossJoins) — legit.
- Key-domain-sized aggregates (per-event_type medians, per-window
  counts, alphabet-bounded LM tables) — legit.
- Bounded-by-contract sides (benchmark shingle sets, hot-shingle cap
  lists, flagged-chunk lists, delta-subset id lists, query batches,
  rerank pools under a WindowGroupLimit) — legit, and usually already
  an explicit ``F.broadcast``.
- TPC-H dimension / filtered-fact sides — stats-adaptive choice is
  Spark's job; leave adaptive.
- Everything else — a corpus-scale relation as a broadcast BUILD is
  the 1g-driver OOM class (pagerank r6, triangle_stats r7, the ANN and
  dedup serving paths r8) and does not exist as a plan at 10^9 rows:
  pin ``shuffle_hash`` (corpus ⋈ corpus) or make the genuinely bounded
  side an explicit ``F.broadcast``.

Usage: ``python tools/broadcast_audit.py [sf_dir]`` (default
/root/testdata/sf0.001). Prints one FLAG line per suspicious subtree
and a final summary; exit code 0 always (triage is human judgment).
"""

from __future__ import annotations

import io
import contextlib
import os
import sys

# invoked as `python tools/broadcast_audit.py` — put the repo root
# (the engine package's parent) on sys.path, not tools/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")
BOUNDING = ("WindowGroupLimit", "CollectLimit", "GlobalLimit", "TakeOrdered")


def _marker(ln: str) -> int:
    for pat in ("+- ", ":- "):
        p = ln.find(pat)
        if p >= 0:
            return p
    return -1


def broadcast_subtrees(plan: str) -> list[tuple[str, str]]:
    """(exchange_line, subtree_text) for every BroadcastExchange in a
    simple-mode explain string: children sit at a strictly deeper
    ``+-``/``:-`` marker column; the next line at or above the node's
    column ends the subtree."""
    lines = plan.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d = _marker(ln)
        sub = []
        for nxt in lines[i + 1 :]:
            if _marker(nxt) <= d:
                break
            sub.append(nxt)
        out.append((ln, "\n".join(sub)))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from airflow_kafka_spark_spark.plans.catalog import CATALOG

    n_flags = 0
    n_err = 0
    for name, q in CATALOG.items():
        try:
            df = q.fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="simple")
            for exch, sub in broadcast_subtrees(buf.getvalue()):
                # match the bare /name too: simple-mode explain truncates
                # long Location strings, so a deep path can cut off the
                # ".parquet" suffix and hide the table (ADVICE r8) —
                # a few extra candidate flags are fine, triage is manual
                hits = [
                    t
                    for t in BIG_TABLES
                    if f"{t}.parquet" in sub or f"/{t}" in sub
                ]
                if not hits or any(b in sub for b in BOUNDING):
                    continue
                mode = "identity" if "IdentityBroadcastMode" in exch else "hashed"
                top = sub.splitlines()[0].strip()[:100] if sub else "?"
                print(f"FLAG {name} [{mode}] tables={hits} :: {top}")
                n_flags += 1
        except Exception as ex:  # audit must not die on one entry
            print(f"ERR {name}: {type(ex).__name__}: {str(ex)[:120]}")
            n_err += 1
    print(f"AUDIT DONE: {n_flags} flags, {n_err} errors, {len(CATALOG)} entries")


if __name__ == "__main__":
    main()
