"""Text analysis over document tables (SURVEY.md §2.12 extension surface).

Tokenization is a plain single-space split (the fixture corpus is
space-separated); every statistic is built from JVM-side higher-order
array functions — no Python in the hot path. Integer arithmetic and
double division keep results bit-identical to the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword list shared verbatim with the SQL oracle
STOPWORDS = ["the", "a", "and", "of", "to"]

# BPE-ish lexer: words | numbers | single non-space symbol
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column) -> Column:
    return F.split(F.lower(text), " ")


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: token counts, distinct ratio, average token
    length, stopword ratio, and a rule-based quality flag."""
    t = tokens(F.col(text_col))
    n_tokens = F.size(t)
    n_distinct = F.size(F.array_distinct(t))
    total_len = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_stop = F.size(F.filter(t, lambda x: x.isin(STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    distinct_ratio = n_distinct.cast("double") / n_tokens.cast("double")
    avg_len = total_len.cast("double") / n_tokens.cast("double")
    quality = (
        (n_tokens >= 10)
        & (n_tokens <= 10_000)
        & (distinct_ratio >= 0.2)
        & (stop_ratio <= 0.5)
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        quality.cast("int").alias("is_quality"),
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text (md5 is available and byte-identical in Spark and DuckDB, so the
    fingerprint — unlike murmur/xxhash — is portable across engines)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    )


def bpe_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token accounting with a BPE-ish regex lexer, grouped by
    source: total tokens, average per doc."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0)
    per_doc = docs.select(
        "source", F.size(toks).cast("long").alias("n_bpe_tokens")
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bpe_tokens").alias("total_tokens"),
        F.round(
            F.sum("n_bpe_tokens").cast("double") / F.count("*").cast("double"), 6
        ).alias("avg_tokens_per_doc"),
    )


def language_profile(docs: DataFrame) -> DataFrame:
    """Per-language corpus profile + a trivial n-gram language heuristic
    (english-stopword hit rate) evaluated against the labeled ``lang``
    column. The heuristic is deliberately simple and deterministic; it is
    the *plumbing* (per-doc scoring, corpus rollup) that matters."""
    t = tokens(F.col("text"))
    n_tokens = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(STOPWORDS)))
    looks_en = (
        n_stop.cast("double") / n_tokens.cast("double") >= 0.05
    ).cast("int")
    per_doc = docs.select("lang", "source", "n_chars", looks_en.alias("looks_en"))
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.round(
            F.sum("n_chars").cast("double") / F.count("*").cast("double"), 6
        ).alias("avg_chars"),
        F.sum("looks_en").cast("long").alias("n_looks_en"),
    )
