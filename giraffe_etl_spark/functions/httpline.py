"""HTTP request-line parsing (the HttpGet engine analog).

Input shape ``host,METHOD /document PROTOCOL`` — the reference's
HttpGet dataprocessor splits it into method/document/protocol and
synthesizes a full URL from host + document, which then flows through
the standard URL normalizer.

Reference behavior studied (not ported): giraffe-etl
HttpGet.java:43-137.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .url_expr import normalize_url_expr

_RE = r"^([^,]+),(\S+) (\S+)(?: (\S+))?$"


def parse_http_get(col: Column | str) -> Column:
    """``host,METHOD /doc PROTO`` -> struct(host, method, document,
    protocol, url) with the synthesized URL already canonicalized."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.regexp_extract(c, _RE, 1)
    method = F.regexp_extract(c, _RE, 2)
    document = F.regexp_extract(c, _RE, 3)
    protocol = F.regexp_extract(c, _RE, 4)
    ok = c.rlike(_RE)
    url = normalize_url_expr(F.concat(F.lit("http://"), host, document))
    null = F.lit(None).cast("string")
    return F.struct(
        F.when(ok, host).otherwise(null).alias("host"),
        F.when(ok, method).otherwise(null).alias("method"),
        F.when(ok, document).otherwise(null).alias("document"),
        F.when(ok & (protocol != ""), protocol).otherwise(null).alias("protocol"),
        F.when(ok, url).otherwise(null).alias("url"),
    )


def with_http_get(df: DataFrame, col: str = "line") -> DataFrame:
    s = parse_http_get(col)
    return df.select(
        "*",
        s["host"].alias("host"),
        s["method"].alias("method"),
        s["document"].alias("document"),
        s["protocol"].alias("protocol"),
        s["url"].alias("url"),
    )
