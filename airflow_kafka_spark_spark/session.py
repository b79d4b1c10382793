"""SparkSession builder.

Carries over the reference's stability configuration
(reference spark/stock_analysis.py:10-19: network timeout 800s, heartbeat
120s, memory fraction 0.8, force-delete temp checkpoints) and adds the
scale-oriented defaults the reference lacked: AQE, Arrow, UTC session
timezone (required for DuckDB-oracle comparison), and shuffle partitions
sized to the machine instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "airflow_kafka_spark_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession tuned for this engine.

    In local mode the driver is the only JVM, so ``spark.driver.memory``
    is the one memory knob; on a real cluster the same builder works with
    a cluster master URL and executor settings supplied via spark-submit.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Spark 4 defaults ANSI on; the reference ran Spark 3.5 (ANSI off)
        # and the DuckDB oracle yields NULL (not error) on e.g. div-by-zero.
        .config("spark.sql.ansi.enabled", "false")
        # the driver fixtures store events.ts as parquet TIMESTAMP(NANOS),
        # which Spark cannot read natively; read as int64 nanos and convert
        # in sources.files.load_table (exact integer division to micros —
        # matching DuckDB's ns→µs truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # reference stability knobs (spark/stock_analysis.py:13-15,18)
        .config("spark.network.timeout", "800s")
        .config("spark.executor.heartbeatInterval", "120s")
        .config("spark.memory.fraction", "0.8")
        .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
