#!/usr/bin/env python
"""End-to-end embedding/retrieval pipeline: the similarity operators a
100 TB vector-corpus build actually chains, in order.

    raw embeddings
      → embedding near-dup      (ext.similarity.cosine_near_dup_pairs,
                                 one LSH bucket per vector → each pair
                                 once; keeper-resolved drops)
      → int8 quantization       (map-only, posexplode — the storage step
                                 before index sharding)
      → IVF index + query       (k-means on a bounded sample, broadcast
                                 centroids, probe + exact rerank)
      → PQ encode + ADC query   (driver-trained codebooks, Arrow-batched
                                 encode, element_at table-lookup scan)
      → exact brute-force       (cosine_topk — the recall yardstick the
                                 approximate answers are judged against)

Every stage is equi-join / broadcast / map-only — the only driver-side
work is the two bounded training samples (IVF centroids, PQ codebooks).
Run: python examples/embedding_pipeline.py [sf_dir]
(default /root/testdata/sf0.01).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from airflow_kafka_spark_spark.ext.similarity import (
        ann_topk_ivf,
        ann_topk_pq,
        cosine_near_dup_pairs,
        cosine_topk,
        quantize_embeddings,
    )
    from airflow_kafka_spark_spark.session import build_session
    from airflow_kafka_spark_spark.sources.files import load_table

    spark = build_session(app_name="embedding-pipeline-example")
    emb = load_table(spark, sf_dir, "embeddings")
    n0 = emb.count()

    # 1. embedding-space near-dup removal. Pairs alone over-drop chains
    # (A~B, B~C would drop all three but one is enough): keep the MIN id
    # of each pair's drop side only when that id has no surviving smaller
    # neighbor — the standard greedy keeper here is simply "drop the
    # larger id of each pair", which keeps at least one per clique.
    pairs = cosine_near_dup_pairs(emb, threshold=0.95)
    drops = pairs.select(F.col("vec2").alias("vec_id")).distinct()
    emb = emb.join(drops, "vec_id", "left_anti")
    n1 = emb.count()

    # 2. int8 quantization — bandwidth/storage for the index shards
    quant = quantize_embeddings(emb)
    n_q = quant.count()

    # 3-5. the three query paths over the deduped corpus, judged against
    # the exact answer for one probe vector
    probe = emb.select(F.min("vec_id")).first()[0]
    exact = {r["vec_id"]: r["cosine"] for r in cosine_topk(emb, probe, k=10).collect()}
    ivf = {r["vec_id"] for r in ann_topk_ivf(emb, probe, k=10).collect()}
    pq = {r["vec_id"] for r in ann_topk_pq(emb, probe, k=10).collect()}

    recall_ivf = len(ivf & set(exact)) / len(exact)
    recall_pq = len(pq & set(exact)) / len(exact)
    print(
        f"vectors={n0} after_near_dup={n1} quant_rows={n_q} "
        f"probe={probe} recall_ivf={recall_ivf:.2f} recall_pq={recall_pq:.2f}"
    )
    assert recall_ivf >= 0.5 and recall_pq >= 0.5, "ANN recall collapsed"
    spark.stop()


if __name__ == "__main__":
    main()
