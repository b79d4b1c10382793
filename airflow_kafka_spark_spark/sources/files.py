"""File sources for the driver fixtures (TESTDATA.md).

Parquet readers with no schema inference — parquet carries its own schema;
Catalyst pushes filters/projections into the scan (check
``PushedFilters``/``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The caller's session may be a vanilla getOrCreate() (e.g. the driver
    # harness) — set the result-critical confs (nanosAsLong / UTC / ANSI)
    # here so the fixture read and downstream semantics don't depend on
    # who built the session.
    from ..session import ensure_engine_confs

    ensure_engine_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong it arrives as
    # int64 nanos. Convert with *integer* division (ns epoch ≈ 1.7e18
    # overflows double precision) — truncation matches DuckDB's ns→µs read.
    # Normalize to an EXPLICIT TimestampType (LTZ): under
    # spark.sql.timestampType=TIMESTAMP_NTZ (the driver harness sets it)
    # timestamp_micros and the name "timestamp" both resolve to NTZ, which
    # unix_micros & friends reject — r02 range_join_clicks regression. With
    # the session tz pinned to UTC the NTZ→LTZ cast preserves wall-clock.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast(T.TimestampType()),
            )
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def fan_out_narrow_scan(df: DataFrame, *key_cols: str) -> DataFrame:
    """Input-skew remedy (guide §2.5 "one huge unsplittable file"):
    when the scan yields fewer partitions than the session's cores —
    e.g. a single-row-group parquet fixture, whose scan cannot be split
    below row-group granularity — heavy per-row work after the scan
    (decimal casts + aggregation) runs single-threaded inside the scan
    task. Round-robin repartition to ``defaultParallelism`` spreads
    that work across the cores for one small shuffle of the projected
    rows.

    Scale-adaptive by construction, not a local[32] constant: the
    trigger compares the PLANNED scan partition count against the
    session's parallelism, so a production table of many files/row
    groups (scan partitions >= cores) passes through untouched, and a
    lower-core bench leg sees both sides shrink together. Call it on a
    frame already filtered and projected to the columns the consumer
    needs (shuffle the narrow rows, guide §2.3). Safe only for
    partitioning-independent consumers — exact (decimal/integer)
    aggregates, not raw double sums.

    ``key_cols``: hash-repartition on those columns instead of
    round-robin — for a consumer that immediately groups/joins on the
    same keys, the repartition IS that operator's exchange (Catalyst
    sees the distribution already satisfied), so the heavy aggregation
    fans out at zero extra shuffles (guide §2.4 "two operations keyed
    the same way share one exchange").
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= parallelism:
        if key_cols:
            return df.repartition(parallelism, *key_cols)
        return df.repartition(parallelism)
    return df


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss.SSSSSS",
) -> DataFrame:
    """CSV source with an EXPLICIT schema — inference reads the data
    twice and types drift run-to-run, both wrong at scale. PERMISSIVE
    mode (malformed → nulls) matches the engine's JSON-edge policy."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("timestampFormat", timestamp_format)
        .csv(path)
    )


def read_jsonl_table(
    spark: SparkSession,
    path: str,
    schema: str,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss.SSSSSS",
) -> DataFrame:
    """JSON-lines source with an explicit schema; unknown fields are
    dropped by the schema projection, malformed rows go PERMISSIVE-null
    (same contract as from_json on the Kafka path)."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("timestampFormat", timestamp_format)
        .json(path)
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql``."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_orc_table(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """ORC sink (the other columnar lake format; Avro's module is not
    bundled in this distro — gate on spark.read.format("avro") if
    needed). Same pushdown/pruning properties as parquet: predicates and
    column projection reach the ORC scan."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-asset ingestion for the multimodal path: Spark's ``binaryFile``
    source over a directory (recursive), yielding
    ``(path, modificationTime, length, content binary)`` — the frame
    ext.multimodal's decoders consume (opaque ``binary`` column + typed
    metadata).

    ``glob`` filters filenames (``pathGlobFilter``, e.g. ``"*.png"``) at
    LISTING time — unmatched files are never opened. ``max_bytes``
    filters on the ``length`` metadata column BEFORE ``content`` is
    read: binaryFile supports predicate pushdown on length, so a
    corpus's pathological 5 GB outlier never reaches an executor's
    memory (each content cell must fit in one row — cap it, chunk
    oversized assets upstream).
    """
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df
