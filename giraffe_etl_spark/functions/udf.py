"""Arrow-batched pandas UDF wrappers over the pure transform library.

The giraffe task chain (SURVEY.md §2.2) becomes a chain of
``withColumn`` calls over these UDFs.  All of them are Series->Series
``pandas_udf``s: data crosses the JVM/Python boundary in Arrow record
batches (no per-row Python UDFs anywhere in the engine, per
BASELINE.json input_hint).

Scale note: each UDF is stateless and embarrassingly parallel — cost is
O(rows) per partition with zero shuffle.  On a 1000-executor cluster
these run inside the same stage as the surrounding projections.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, LongType, StringType

from .text import extract_text, fingerprint64, quality_score, tag_lang, token_count
from .url import normalize_url


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: extract_text(bytes(b)) if b is not None else None)


@F.pandas_udf(StringType())
def tag_lang_udf(text: pd.Series) -> pd.Series:
    return text.map(tag_lang)


@F.pandas_udf(StringType())
def normalize_url_udf(url: pd.Series) -> pd.Series:
    return url.map(normalize_url)


@F.pandas_udf(IntegerType())
def token_count_udf(text: pd.Series) -> pd.Series:
    return text.map(token_count).astype("Int32")


@F.pandas_udf(DoubleType())
def quality_score_udf(text: pd.Series) -> pd.Series:
    return text.map(quality_score).astype("float64")


@F.pandas_udf(LongType())
def fingerprint64_udf(text: pd.Series) -> pd.Series:
    return text.map(fingerprint64).astype("Int64")
