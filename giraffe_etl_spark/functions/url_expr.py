"""JVM-side URL normalization (Catalyst expression, no Python).

``normalize_url_expr`` re-expresses functions/url.py::normalize_url as
a pure Column expression so the CDC canonicalization step runs inside
whole-stage codegen instead of costing an extra Arrow round trip of the
full change batch (html payload included) through a Python worker.

Parity contract: for URLs matching the *simple grammar*

    scheme://host[:port][/path][?query][#fragment]

with ``host`` built from [A-Za-z0-9.-] (no userinfo, no IPv6 literal,
no percent-encoded authority), the expression is byte-identical to the
pure-Python normalizer (property-tested in tests/test_functions.py).
URLs outside the grammar are returned trimmed-but-unchanged — use
``canonicalize(mode="udf")`` when full urllib semantics are required.

Reference behavior studied (not ported): giraffe-etl dataprocessors
URLComponents.normalize, URLComponents.java:262-362.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_INDEX_FILES = ("index.html", "index.htm", "index.php", "default.htm", "default.html")

# the simple grammar guarded by the expression (see module docstring)
_SIMPLE_URL_RE = (
    r"^[A-Za-z][A-Za-z0-9+.-]*://[A-Za-z0-9.-]+(:[0-9]+)?(/[^?#]*)?(\?[^#]*)?(#.*)?$"
)


def _resolve_path(path: Column) -> Column:
    """Mirror url.py::_normalize_path: fold '.'/'..', strip index file."""
    segs = F.split(path, "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, seg: (
            F.when(seg == ".", acc)
            .when(
                seg == "..",
                F.when(
                    (F.size(acc) > 0) & (F.element_at(acc, -1) != ""),
                    F.slice(acc, 1, F.size(acc) - 1),
                ).otherwise(acc),
            )
            .otherwise(F.concat(acc, F.array(seg)))
        ),
    )
    index_hit = (F.size(folded) > 0) & F.lower(F.element_at(folded, -1)).isin(
        *_INDEX_FILES
    )
    stripped = F.when(
        index_hit,
        F.concat(F.slice(folded, 1, F.size(folded) - 1), F.array(F.lit(""))),
    ).otherwise(folded)
    joined = F.array_join(stripped, "/")
    return F.when(joined.startswith("/"), joined).otherwise(F.concat(F.lit("/"), joined))


def _sorted_query(query: Column) -> Column:
    """Mirror the python sort: pairs ordered by (key, whole-pair)."""
    pairs = F.filter(F.split(query, "&"), lambda p: p != "")
    keyed = F.transform(
        pairs,
        lambda p: F.struct(
            F.regexp_extract(p, "^([^=]*)", 1).alias("k"), p.alias("p")
        ),
    )
    return F.array_join(F.transform(F.array_sort(keyed), lambda s: s["p"]), "&")


def normalize_url_expr(url: Column | str) -> Column:
    """Canonical CDC key as a JVM expression (see module docstring)."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)

    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authpath = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^?#]*)", 1)
    authority = F.regexp_extract(authpath, r"^([^/]*)", 1)
    raw_path = F.regexp_extract(authpath, r"^[^/]*(/.*)?$", 1)
    # the '?' must precede any '#': a fragment may itself contain '?'
    query = F.regexp_extract(u, r"^[^#]*\?([^#]*)", 1)

    host0 = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    host = F.when(
        host0.startswith("www.") & (F.length(host0) > 4), F.substring(host0, 5, 2_000_000)
    ).otherwise(host0)
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    # compare numerically: ':0080' is the default port too (python int())
    default_port = ((scheme == "http") & (port.cast("int") == 80)) | (
        (scheme == "https") & (port.cast("int") == 443)
    )
    portpart = F.when((port == "") | default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port.cast("int").cast("string"))
    )

    path = F.when(raw_path == "", F.lit("/")).otherwise(_resolve_path(raw_path))
    q = _sorted_query(query)

    normalized = F.concat(
        scheme,
        F.lit("://"),
        host,
        portpart,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(u.isNull(), F.lit(None).cast("string")).when(
        u.rlike(_SIMPLE_URL_RE), normalized
    ).otherwise(u)
