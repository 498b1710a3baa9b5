"""Text-analysis operators over a documents table.

DataFrame -> DataFrame wrappers around the pure function library
(functions/text.py) plus fully-JVM-side variants where the semantics
allow.  The JVM variants (``*_expr``) are preferred in hot paths; the
pandas-UDF variants guarantee oracle parity with the pure functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.udf import (
    fingerprint64_udf,
    quality_score_udf,
    tag_lang_udf,
    token_count_udf,
)


def with_lang(df: DataFrame, text_col: str = "text", out_col: str = "lang_tag") -> DataFrame:
    """Heuristic language ID (stopword vote) — Arrow-batched UDF."""
    return df.withColumn(out_col, tag_lang_udf(F.col(text_col)))


def with_quality(df: DataFrame, text_col: str = "text", out_col: str = "quality") -> DataFrame:
    return df.withColumn(out_col, quality_score_udf(F.col(text_col)))


def with_token_count(df: DataFrame, text_col: str = "text", out_col: str = "n_tokens") -> DataFrame:
    return df.withColumn(out_col, token_count_udf(F.col(text_col)))


def with_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp64") -> DataFrame:
    return df.withColumn(out_col, fingerprint64_udf(F.col(text_col)))


# ---- JVM-side equivalents (no Python in the plan) --------------------------

def token_count_expr(text_col: str) -> F.Column:
    r"""Whitespace+punctuation token count as a pure SQL expression.

    Equivalent to functions.text.token_count (regex \w+|[^\w\s]) so the
    DuckDB oracle can reproduce it with regexp_matches-based counting.
    (?U) makes Java's \w/\s Unicode-aware like Python's re module.
    """
    return F.size(
        F.filter(
            F.split(
                F.regexp_replace(F.col(text_col), r"(?U)([^\w\s])", r" $1 "),
                r"(?U)\s+",
            ),
            lambda t: t != "",
        )
    ).cast("int")


def char_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap JVM-side quality signals: lengths, word count, upper ratio."""
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    return df.select(
        *df.columns,
        F.length(t).alias("n_chars_calc"),
        F.size(words).alias("n_words"),
        (
            F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("double")
            / F.greatest(F.length(t), F.lit(1)).cast("double")
        ).alias("alpha_ratio"),
    )
