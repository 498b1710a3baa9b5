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
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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


@F.pandas_udf(
    StructType(
        [
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
)
def extract_text_lang_udf(html: pd.Series) -> pd.DataFrame:
    """Fused html -> (text, lang) in ONE Arrow crossing.

    ``tag_lang(extract_text(html))`` as separate pandas UDFs plans two
    ArrowEvalPython nodes: the html payload crosses to Python, text
    comes back, then the text column crosses AGAIN for lang — twice the
    Arrow serialization, twice the per-task Python worker setup, and an
    extra JVM-side row materialization between the nodes (measured on
    the CDC merge stage: ~490 MB sent / 216 MB returned per 2M-event
    batch, with worker setup dominating task run time).  Computing both
    in one struct-returning UDF sends html once, returns (text, lang)
    once, and reuses the just-extracted text in-process.  Outputs are
    byte-identical to the unfused chain by construction (same pure
    functions, same order).
    """
    texts = html.map(lambda b: extract_text(bytes(b)) if b is not None else None)
    return pd.DataFrame({"text": texts, "lang": texts.map(tag_lang)})
