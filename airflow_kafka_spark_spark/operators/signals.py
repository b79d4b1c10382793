"""Rule-based suggestion cascade C1/C2 (SURVEY.md §2.7).

The reference's ``np.select(conditions, choices, default)`` is first-match-
wins with NaN comparisons evaluating False (spark/stock_analysis.py:194-224).
``F.when(...).when(...).otherwise(...)`` has identical semantics — first
match wins, NULL comparisons are false — so warm-up rows (NULL indicators)
fall through to the default exactly as in the reference.

Reason strings are copied verbatim from spark/stock_analysis.py:219-224.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUGGESTIONS = ["BUY", "HOLD/SELL", "WATCH/BUY", "SELL/AVOID"]
DEFAULT_SUGGESTION = "HOLD"

REASONS = [
    "Xu hướng tăng (MA5 > MA20). RSI chưa quá mua. MACD tích cực (MACD > Signal). Đề xuất: MUA - Xu hướng tăng, RSI chưa quá mua, MACD tích cực.",
    "Xu hướng tăng (MA5 > MA20). Quá mua (RSI > 70). Đề xuất: CÂN NHẮC BÁN - Thị trường có dấu hiệu quá mua.",
    "Xu hướng giảm (MA5 < MA20). Quá bán (RSI < 30). MACD tích cực (MACD > Signal). Đề xuất: THEO DÕI/MUA - Thị trường đang quá bán, có dấu hiệu đảo chiều.",
    "Xu hướng giảm (MA5 < MA20). MACD tiêu cực (MACD < Signal). Đề xuất: BÁN/TRÁNH - Xu hướng giảm, MACD tiêu cực.",
]
DEFAULT_REASON = "Xu hướng trung tính. Đề xuất: GIỮ - Chờ tín hiệu rõ ràng hơn."


def _conditions(df: DataFrame) -> list[Column]:
    """The four rule conditions, in reference order
    (spark/stock_analysis.py:194-212)."""
    ma5, ma20 = F.col("ma5"), F.col("ma20")
    rsi = F.col("rsi")
    macd, sig = F.col("macd_line"), F.col("macd_signal")
    return [
        (ma5 > ma20) & (rsi < 70) & (macd > sig),   # BUY
        (ma5 > ma20) & (rsi >= 70),                 # HOLD/SELL
        (ma5 < ma20) & (rsi <= 30) & (macd > sig),  # WATCH/BUY
        (ma5 < ma20) & (macd <= sig),               # SELL/AVOID
    ]


def _cascade(conds: list[Column], choices: list[str], default: str) -> Column:
    expr = F.when(conds[0], F.lit(choices[0]))
    for cond, choice in zip(conds[1:], choices[1:]):
        expr = expr.when(cond, F.lit(choice))
    return expr.otherwise(F.lit(default))


def with_suggestion(df: DataFrame) -> DataFrame:
    """Append ``suggestion`` and ``reason`` (C1/C2). Requires the indicator
    columns from ``operators.indicators.with_indicators``."""
    conds = _conditions(df)
    return df.withColumn(
        "suggestion", _cascade(conds, SUGGESTIONS, DEFAULT_SUGGESTION)
    ).withColumn("reason", _cascade(conds, REASONS, DEFAULT_REASON))
