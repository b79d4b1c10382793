"""Streaming drift monitor: a ``foreachBatch`` factory that compares
each micro-batch against a stored reference window with the exact drift
family (``ext.drift``) — the shape a training-data pipeline actually
runs: "does the batch I'm about to ingest look like the corpus I
trained on?", answered per cohort before the batch is trusted.

Per micro-batch, against the same materialized reference:

- ``tvd`` — categorical mix shift of ``category`` (BIGINT-exact
  numerator);
- ``ks`` — numeric distribution shift of ``value`` (exact ECDF
  distance, no quantile interpolation);
- ``auc`` — Mann–Whitney direction of the numeric shift (0.5 = none;
  tie-correct integer midranks).

Scale shape: the reference window is projected to the monitored
columns and ``persist()``-materialized ONCE at monitor construction —
not re-scanned per micro-batch (a lazy frame would re-run the
reference scan every trigger; persist rather than localCheckpoint so
an executor loss recomputes the lost blocks instead of killing the
monitor). Each micro-batch pins its tagged union for the batch
duration when more than one metric runs — the metrics are separate
actions, and uncached each would re-read the micro-batch source. At
100 TB the reference should itself be a bounded window or sample —
the monitor's cost per batch is then one conditional-count groupBy
over reference+batch and window sums over the tiny (cohort × distinct
key) count table, the ``_split_value_counts`` contract. The
per-cohort report is key-domain-sized — the one legitimate collect
class.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ext.drift import ks_drift, mw_drift, tvd_drift

Report = list[dict]


def make_drift_monitor(
    reference: DataFrame,
    cohort: str,
    category: str | None = None,
    value: str | None = None,
    on_report: Callable[[int, Report], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` callable that drift-checks every
    micro-batch against ``reference``.

    ``cohort``/``category``/``value`` are column names present in BOTH
    the reference and the stream (the micro-batch carries the stream's
    schema). At least one of ``category`` (categorical mix → tvd) or
    ``value`` (numeric distribution → ks + auc) must be given.
    ``on_report(batch_id, rows)`` receives one dict per (cohort,
    metric): ``{"cohort", "metric", "stat", "n_ref", "n_batch",
    "one_sided"}``; default prints one line per row.

    **One-sided cohorts** (ADVICE r9): a cohort present in only one of
    reference/micro-batch has no comparison — the drift family's
    deliberate NULL-on-0/0 contract surfaces as ``stat=None`` on that
    row. Such rows carry ``one_sided=True`` (``n_ref`` or ``n_batch``
    is 0); an ``on_report`` that thresholds ``stat`` numerically must
    skip them (``if r["one_sided"]: continue``) or it will TypeError
    on ``None``. A brand-new cohort appearing in a batch is itself a
    drift signal — report it from the marker, not the stat. Wire with
    ``stream.writeStream.foreachBatch(make_drift_monitor(...))``.
    """
    if category is None and value is None:
        raise ValueError(
            "make_drift_monitor: need category= (tvd) and/or value= "
            "(ks/auc) — nothing to monitor otherwise"
        )
    cols = [cohort] + [c for c in (category, value) if c is not None]
    # materialize the reference ONCE: every micro-batch reuses the
    # stored rows instead of re-running the reference scan per trigger.
    # persist(), NOT localCheckpoint (r13 review): checkpoint blocks
    # live on executors with lineage TRUNCATED, so the first executor
    # decommission in a long-running monitor would permanently kill
    # every later batch (block lost, nothing to recompute from);
    # persist keeps the lineage, so a lost block just recomputes. The
    # count() eagerizes it like the old eager checkpoint did.
    ref = reference.select(*cols).persist()
    ref.count()

    def _default_report(batch_id: int, rows: Report) -> None:
        for r in rows:
            print(
                f"[drift batch={batch_id}] cohort={r['cohort']} "
                f"{r['metric']}={r['stat']} "
                f"(n_ref={r['n_ref']}, n_batch={r['n_batch']})"
            )

    report = on_report or _default_report

    def _monitor(batch_df: DataFrame, batch_id: int) -> None:
        tagged = (
            ref.withColumn("__w", F.lit(0))
            .unionByName(batch_df.select(*cols).withColumn("__w", F.lit(1)))
        )
        n_metrics = (category is not None) + 2 * (value is not None)
        if n_metrics > 1:
            # each metric is its own action; without the cache every
            # action re-reads the micro-batch source (for a Kafka
            # batch_df that is a broker re-fetch per metric, r13
            # review) — pin the tagged union for the batch duration
            tagged = tagged.persist()
        rows: Report = []

        def _emit(df: DataFrame, metric: str, stat_col: str) -> None:
            for r in df.collect():  # key-domain-sized: one row per cohort
                rows.append(
                    {
                        "cohort": r["cohort"],
                        "metric": metric,
                        "stat": r[stat_col],
                        "n_ref": r["n_a"],
                        "n_batch": r["n_b"],
                        # cohort seen on one side only → stat is None
                        # (NULL-on-0/0 contract); consumers must guard
                        "one_sided": r["n_a"] == 0 or r["n_b"] == 0,
                    }
                )

        if category is not None:
            _emit(
                tvd_drift(tagged, F.col(cohort), F.col("__w"), category),
                "tvd",
                "tvd",
            )
        if value is not None:
            _emit(
                ks_drift(tagged, F.col(cohort), F.col("__w"), F.col(value)),
                "ks",
                "ks",
            )
            _emit(
                mw_drift(tagged, F.col(cohort), F.col("__w"), F.col(value)),
                "auc",
                "auc",
            )
        if n_metrics > 1:
            tagged.unpersist()
        report(batch_id, rows)

    return _monitor
