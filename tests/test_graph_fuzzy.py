"""Graph primitives (ext.graph), blocked fuzzy join (ext.fuzzy), and the
BPE merge-pair census (ext.textstats.merge_pair_counts) — semantics on
hand-built inputs with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_kafka_spark_spark.ext.fuzzy import blocked_fuzzy_join
from airflow_kafka_spark_spark.ext.graph import basket_pairs, triangle_stats
from airflow_kafka_spark_spark.ext.textstats import merge_pair_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src int, dst int")


def test_basket_pairs_expansion_and_dedup(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (1, 20), (2, 20), (2, 10), (3, 99)],
        "basket int, item int",
    )
    got = {
        (r["src"], r["dst"])
        for r in basket_pairs(df, "basket", "item").collect()
    }
    # basket 1 → {10,20,30} (duplicate 20 collapses), basket 2 → {10,20}
    # (pair deduped against basket 1's), basket 3 singleton → nothing
    assert got == {(10, 20), (10, 30), (20, 30)}


def test_basket_pairs_size_cap(spark):
    df = spark.createDataFrame(
        [(1, i) for i in range(5)] + [(2, 1), (2, 2)], "basket int, item int"
    )
    capped = basket_pairs(df, "basket", "item", max_basket_size=3)
    assert {(r["src"], r["dst"]) for r in capped.collect()} == {(1, 2)}


def test_triangle_stats_k4(spark):
    # K4: 4 nodes, 6 edges, C(4,3)=4 triangles; every wedge closes →
    # clustering 1.0
    k4 = _edges(
        spark, [(a, b) for a in range(4) for b in range(4) if a < b]
    )
    row = triangle_stats(k4).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 6, 4)
    assert row["clustering"] == 1.0


def test_triangle_stats_path_graph_no_triangles(spark):
    row = triangle_stats(_edges(spark, [(1, 2), (2, 3), (3, 4)])).collect()[0]
    assert row["n_triangles"] == 0
    assert row["clustering"] == 0.0


def test_triangle_stats_skewed_star_plus_triangle(spark):
    """A star (celebrity hub 0) contributes wedges but no triangles; one
    off-star triangle must still be counted exactly once despite the
    degree orientation routing its wedge through the lowest-degree
    vertex."""
    star = [(0, i) for i in range(1, 8)]
    tri = [(10, 11), (11, 12), (10, 12)]
    row = triangle_stats(_edges(spark, star + tri)).collect()[0]
    assert row["n_triangles"] == 1
    assert row["n_nodes"] == 11 and row["n_edges"] == 10


def test_triangle_stats_ignores_self_loops_and_dup_edges(spark):
    row = triangle_stats(
        _edges(spark, [(1, 2), (1, 2), (2, 2), (2, 3), (1, 3)])
    ).collect()[0]
    assert (row["n_edges"], row["n_triangles"]) == (3, 1)


def test_blocked_fuzzy_join_within_block(spark):
    clean = spark.createDataFrame([("red widget",), ("blue bolt",)], "name string")
    dirty = spark.createDataFrame(
        [(1, "red widgt"), (2, "blue boltt"), (3, "red xxxxxx")],
        "did int, qname string",
    )
    out = blocked_fuzzy_join(clean, dirty, "name", "qname", max_dist=1)
    got = {(r["name"], r["did"], r["dist"]) for r in out.collect()}
    # id 3 shares the "red" block but is past the distance band
    assert got == {("red widget", 1, 1), ("blue bolt", 2, 1)}


def test_blocked_fuzzy_join_blocking_is_a_recall_trade(spark):
    """A corruption INSIDE the block prefix escapes the join — the
    documented contract, pinned so it can't silently change."""
    clean = spark.createDataFrame([("red widget",)], "name string")
    dirty = spark.createDataFrame([(1, "Xed widget")], "did int, qname string")
    out = blocked_fuzzy_join(clean, dirty, "name", "qname", max_dist=1)
    assert out.count() == 0


def test_merge_pair_counts_known_census(spark):
    docs = spark.createDataFrame(
        [("a b c a b",), ("a b",), ("solo",)], "text string"
    )
    got = {
        (r["pair"], r["n"])
        for r in merge_pair_counts(docs, top_n=10).collect()
    }
    # pairs: doc1 → (a b)(b c)(c a)(a b), doc2 → (a b); "solo" has one
    # token → contributes nothing
    assert got == {("a b", 3), ("b c", 1), ("c a", 1)}


def test_merge_pair_counts_top_n_deterministic_cut(spark):
    docs = spark.createDataFrame([("z y x w",)], "text string")
    out = merge_pair_counts(docs, top_n=2).collect()
    # all pairs tie at n=1 → lexicographic pair order decides the cut
    assert [r["pair"] for r in out] == ["x w", "y x"]
