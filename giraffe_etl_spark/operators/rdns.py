"""Reverse-DNS enrichment modeled as a deterministic vectorized UDF.

The reference resolves PTR records through an external DNS service on a
small worker pool and caches results with a 3-day TTL.  An external
service has no place in a deterministic replay, so the resolver here is
a PURE function of the IP (synthetic PTR grammar) executed as an
Arrow-batched pandas UDF — the Spark analog of the reference's worker
pool is partition parallelism, and the TTL-cache analog is the lake
table + ``reenrich_stale`` (operators/enrich.py).  Swapping the pure
function for a real ``socket.gethostbyaddr`` call changes nothing else
in the plan.

Reference behavior studied (not ported): giraffe-etl
DNSResolver.java:36-55 (PTR lookup, strip ONE trailing dot),
HostNameResolver.java:31-105 (worker pool ~8, 3-day TTL cache).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

PTR_SUFFIX = ".example.org"


def _ptr_name(ips: pd.Series) -> pd.Series:
    """Synthetic PTR answer, WITH the trailing dot a real zone returns."""
    return "ptr-" + ips.str.replace(".", "-", regex=False) + PTR_SUFFIX + "."


def _resolve_batch(ips: pd.Series) -> pd.Series:
    """ip -> hostname; strips one trailing dot like the reference."""
    raw = _ptr_name(ips)
    return raw.mask(raw.str.endswith("."), raw.str.slice(0, -1))


def reverse_dns_udf() -> "Callable":
    """Arrow-batched resolver UDF (built lazily: pandas_udf return-type
    parsing needs an active SparkSession, so no module-level decorator)."""
    return pandas_udf(_resolve_batch, "string")


def reverse_dns_expr(ip: Column | str) -> Column:
    """Same resolution as a pure Catalyst expression (codegen path).

    Exists because the synthetic resolver happens to be
    SQL-expressible; the UDF form above is the drop-in point for a
    real resolver.  Both are property-tested to agree.
    """
    c = F.col(ip) if isinstance(ip, str) else ip
    return F.concat(
        F.lit("ptr-"), F.replace(c, F.lit("."), F.lit("-")), F.lit(PTR_SUFFIX)
    )


def resolve_hosts(df: DataFrame, ip_col: str = "ip", mode: str = "udf") -> DataFrame:
    """Append ``host`` resolved from ``ip_col``.

    ``mode="udf"``: Arrow-batched pandas UDF (the real-resolver shape);
    ``mode="expr"``: whole-stage-codegen expression (synthetic only).
    """
    fn = reverse_dns_udf() if mode == "udf" else reverse_dns_expr
    return df.withColumn("host", fn(F.col(ip_col)))
