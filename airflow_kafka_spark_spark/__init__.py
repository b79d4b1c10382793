"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference stock-analytics pipeline
(DaoTienSang/Airflow-kafka-spark), re-expressed Spark-first.

Layout (SURVEY.md §7):
    session.py     SparkSession builder with the reference's stability confs
    schemas.py     explicit StructTypes for every wire/data format
    sources/       Kafka + file sources, synthetic fixture builders
    operators/     parse, dedup-latest, indicators (W1-W10), signals (C1-C2),
                   serialize, relational helpers
    functions/     reusable column-level building blocks (windows, ema, text,
                   vectors)
    streaming/     Structured Streaming shell (trigger, checkpoint, shutdown)
    ext/           LLM-data-pipeline extensions: dedup, similarity, textstats,
                   multimodal
    plans/         the query catalog consumed by __spark_entry__ (queries +
                   DuckDB oracle SQL)

All analytics run on executors via DataFrame/Window/applyInPandas — the
reference's driver-side pandas detour (reference spark/stock_analysis.py:153
``toPandas()`` inside ``foreachBatch``) is deliberately not reproduced.
"""

__version__ = "0.1.0"
