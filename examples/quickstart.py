#!/usr/bin/env python
"""Quickstart: the engine's main surfaces in one script.

    python examples/quickstart.py            # uses /root/testdata/sf0.001
    SPARK_GRAFT_SF_DIR=... python examples/quickstart.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    from pyspark.sql import functions as F

    from airflow_kafka_spark_spark.ext.dedup import minhash_lsh_pairs
    from airflow_kafka_spark_spark.ext.similarity import cosine_topk
    from airflow_kafka_spark_spark.functions.windows import last_per_key
    from airflow_kafka_spark_spark.session import build_session
    from airflow_kafka_spark_spark.sources.files import load_table, register_views
    from airflow_kafka_spark_spark.sources.fixtures import build_history_messages
    from airflow_kafka_spark_spark.streaming.pipeline import analyze_history_batch

    spark = build_session(app_name="quickstart")

    # 1. The flagship pipeline: nested Kafka-wire messages -> indicators
    #    -> suggestion -> latest row per symbol (the dashboard question)
    messages = build_history_messages(spark, sf_dir)
    processed = analyze_history_batch(messages)
    latest = last_per_key(processed, ["symbol"], [F.col("date_str")])
    print("\n== Latest suggestion per symbol ==")
    latest.select("symbol", "close", "rsi", "suggestion").show(5, truncate=False)

    # 2. Relational SQL over the fixture tables
    register_views(spark, sf_dir)
    print("== Revenue by nation (SQL API) ==")
    spark.sql(
        """
        SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY revenue DESC LIMIT 5
        """
    ).show(truncate=False)

    # 3. Training-data ops: near-duplicate docs + embedding search
    docs = load_table(spark, sf_dir, "documents")
    print("== MinHash-LSH near-duplicate pairs ==")
    minhash_lsh_pairs(docs, threshold=0.4).show(5, truncate=False)

    emb = load_table(spark, sf_dir, "embeddings")
    print("== Top-5 nearest embeddings to vec 0 ==")
    cosine_topk(emb, query_vec_id=0, k=5).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
