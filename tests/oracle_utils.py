"""Local replica of the driver's DuckDB-oracle comparison: row count,
sorted-by-name columns, order-insensitive value comparison. Exact by
default (we engineer queries for bit-identical output); reports max
numeric deviation on mismatch to aid debugging."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from airflow_kafka_spark_spark.sources.files import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    return pdf


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty → parity)."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    if len(a) != len(b):
        return problems
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # int-on-one-side / float-on-the-other renders differently
            # ("1540" vs "1540.0") — a value-hash mismatch for the driver
            # even when numerically equal. DuckDB returns HUGEINT sums as
            # float64; require explicit CASTs in the oracle instead.
            kinds = {av.dtype.kind, bv.dtype.kind}
            if kinds & {"i", "u"} and not (av.isna().any() or bv.isna().any()):
                problems.append(
                    f"col {col}: dtype kind mismatch spark={a[col].dtype} "
                    f"oracle={b[col].dtype} (int vs float renders differently)"
                )
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = (~eq).to_numpy().nonzero()[0][:5]
                diffs = (av - bv).abs()
                problems.append(
                    f"col {col}: {int((~eq).sum())} mismatches, "
                    f"max |diff|={diffs.max()}, first bad rows {bad.tolist()}: "
                    f"spark={av.iloc[bad].tolist()} oracle={bv.iloc[bad].tolist()}"
                )
        else:
            av_n = av.where(pd.notna(av), None).astype(object)
            bv_n = bv.where(pd.notna(bv), None).astype(object)
            eq = av_n.map(str) == bv_n.map(str)
            if not eq.all():
                bad = (~eq).to_numpy().nonzero()[0][:5]
                problems.append(
                    f"col {col}: {int((~eq).sum())} value mismatches, rows {bad.tolist()}: "
                    f"spark={av_n.iloc[bad].tolist()} oracle={bv_n.iloc[bad].tolist()}"
                )
    return problems
