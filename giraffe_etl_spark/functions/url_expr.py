"""JVM-side URL normalization (Catalyst expression, no Python).

``normalize_url_expr`` re-expresses functions/url.py::normalize_url as
a pure Column expression so the CDC canonicalization step runs inside
the JVM instead of costing an extra Arrow round trip of the full change
batch (html payload included) through a Python worker.

Parity contract: for URLs matching the *simple grammar*

    scheme://host[:port][/path][?query][#fragment]

with ``host`` built from [A-Za-z0-9.-] (no userinfo, no IPv6 literal,
no percent-encoded authority) and ``port`` in [0, 65535], the
expression is byte-identical to the pure-Python normalizer
(property-tested in tests/test_url_expr.py).  URLs outside the grammar
— and in-grammar URLs whose port exceeds 65535, which urllib rejects —
are returned trimmed-but-unchanged.  The CDC oracle
(cdc/oracle.py) defines the canonical key with the same grammar guard
(``normalize_url_simple``), so engine and oracle agree on EVERY input,
in- or out-of-grammar.

Performance note (measured, round 2): a naive single-Column build of
this expression duplicates every shared subtree — the path-fold
``aggregate`` ended up in the tree ~10x, and higher-order functions
run interpreted with no common-subexpression elimination, costing
~0.6 ms/row.  Every shared piece is therefore bound exactly once via
``_let`` (a single-element ``transform``, whose lambda variable is
evaluated once and referenced many times), which brought the cost to
~3 us/row — ~200x faster on the same input.

Reference behavior studied (not ported): giraffe-etl dataprocessors
URLComponents.normalize, URLComponents.java:262-362.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .url import SIMPLE_URL_RE as _SIMPLE_URL_RE

_INDEX_FILES = ("index.html", "index.htm", "index.php", "default.htm", "default.html")


def _let(expr: Column, body) -> Column:
    """Bind ``expr`` to a lambda variable evaluated ONCE, apply ``body``.

    ``transform`` over a one-element array is the cheapest Catalyst
    construct that introduces a bound variable; the alternative —
    referencing ``expr`` repeatedly — duplicates its whole subtree per
    reference (and HOF subtrees are interpreted, not codegen'd).
    """
    return F.element_at(F.transform(F.array(expr), body), 1)


def _resolve_path(path: Column) -> Column:
    """Mirror url.py::_normalize_path: fold '.'/'..', strip index file.

    The fold's finish lambda receives the accumulated array as a bound
    variable, so the strip/join logic references it for free.
    """
    return F.aggregate(
        F.split(path, "/"),
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
        lambda acc: _let(
            F.when(
                (F.size(acc) > 0)
                & F.lower(F.element_at(acc, -1)).isin(*_INDEX_FILES),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(""))),
            ).otherwise(acc),
            lambda stripped: _let(
                F.array_join(stripped, "/"),
                lambda joined: F.when(joined.startswith("/"), joined).otherwise(
                    F.concat(F.lit("/"), joined)
                ),
            ),
        ),
    )


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


def _assemble(u: Column) -> Column:
    """Normalized form of an in-grammar, trimmed, non-null URL.

    Evaluates to NULL when the port is out of urllib's [0, 65535] range
    — the caller's ``coalesce`` then falls back to the raw input,
    matching the Python normalizer (which treats such URLs as
    unparseable and returns them unchanged).
    """
    pieces = F.struct(
        F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)).alias(
            "scheme"
        ),
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1).alias("auth"),
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1).alias(
            "rawpath"
        ),
        # the '?' must be the FIRST one before any '#': a query may
        # itself contain later '?' characters
        F.regexp_extract(u, r"^[^#?]*\?([^#]*)", 1).alias("query"),
    )

    def build(s: Column) -> Column:
        scheme = s["scheme"]
        host = _let(
            F.lower(F.regexp_extract(s["auth"], r"^([^:]*)", 1)),
            lambda h: F.when(
                h.startswith("www.") & (F.length(h) > 4),
                F.substring(h, 5, 2_000_000),
            ).otherwise(h),
        )
        # out-of-range (>65535) or int64-overflow ports evaluate to NULL,
        # which propagates through the final concat -> whole expression
        # NULL -> caller's coalesce falls back to the raw input
        portpart = _let(
            F.regexp_extract(s["auth"], r":([0-9]+)$", 1),
            lambda ps: F.when(ps == "", F.lit("")).otherwise(
                _let(
                    ps.try_cast("long"),
                    lambda p: F.when(
                        p.isNull() | (p > 65535), F.lit(None).cast("string")
                    )
                    .when(
                        ((scheme == "http") & (p == 80))
                        | ((scheme == "https") & (p == 443)),
                        F.lit(""),
                    )
                    .otherwise(F.concat(F.lit(":"), p.cast("string"))),
                )
            ),
        )
        path = F.when(s["rawpath"] == "", F.lit("/")).otherwise(
            _resolve_path(s["rawpath"])
        )
        qpart = _let(
            _sorted_query(s["query"]),
            lambda q: F.when(q == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), q)
            ),
        )
        return F.concat(scheme, F.lit("://"), host, portpart, path, qpart)

    return _let(pieces, build)


# Already-canonical fast path.  A URL passing this guard is PROVABLY a
# fixed point of the normalizer: lowercase scheme+host with no leading
# www., no port (':' excluded everywhere after the scheme), a present
# path with no uppercase (so the lowercase-only index-file checks below
# are complete), no query, no fragment, no ASCII whitespace, and no
# '.'/'..' segments.  Property-locked by
# test_url_expr.py::test_fast_path_is_fixed_point.
#
# Implemented as pure byte-scan primitives (startswith / locate /
# substring / translate), NOT a regex: Catalyst RLIKE measured ~10 us
# per row on this shape (2M rows: rlike 5.3 s vs the equivalent
# byte-scan chain 0.5 s at 4 cores) — on the CDC hot path, where every
# event's url passes through this guard, the regex alone was the single
# largest non-scaling cost in the apply pipeline.  Equivalence to the
# old guard regex ^https?://(?!www\.)[a-z0-9.-]+/[^?#A-Z:\s]*\z
# (Java semantics: \s is ASCII-only, \z = true end):
# - scheme prefix match == the two startswith checks,
# - (?!www\.)       == hp (the part after ://) not startswith 'www.',
# - [a-z0-9.-]+ '/' == first '/' in hp at position >= 2 AND every char
#                      of the host slice (substring_index) drawn from
#                      the class (translate deletes the class; empty
#                      remainder == all match),
# - [^?#A-Z:\s]*\z  == translate deleting the FORBIDDEN set from ALL of
#                      hp removes nothing — valid on the whole string,
#                      not just the path, because the host class and
#                      '/' contain no forbidden characters, so the two
#                      formulations accept identical strings while
#                      scanning hp once instead of slicing out the path
#                      (expression trees get no common-subexpression
#                      elimination inside CaseWhen branches; every
#                      avoided reference to hp is an avoided
#                      re-evaluation).
_HOST_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789.-"
_PATH_FORBIDDEN = "?#:ABCDEFGHIJKLMNOPQRSTUVWXYZ \t\n\x0b\x0c\r"


def _fast_canonical(u: Column) -> Column:
    hp = F.when(u.startswith("http://"), F.substring(u, 8, 2_000_000)).when(
        u.startswith("https://"), F.substring(u, 9, 2_000_000)
    )  # else NULL -> the guard evaluates null -> CaseWhen treats as false
    grammar = (
        ~hp.startswith("www.")
        & (F.locate("/", hp) >= 2)
        & (F.length(F.translate(hp, _PATH_FORBIDDEN, "")) == F.length(hp))
        & (
            F.length(
                F.translate(F.substring_index(hp, "/", 1), _HOST_CHARS, "")
            )
            == 0
        )
    )
    no_dotseg = (
        ~u.contains("/./")
        & ~u.contains("/../")
        & ~u.endswith("/.")
        & ~u.endswith("/..")
    )
    no_index = (
        ~u.endswith("/index.html")
        & ~u.endswith("/index.htm")
        & ~u.endswith("/index.php")
        & ~u.endswith("/default.htm")
        & ~u.endswith("/default.html")
    )
    return grammar & no_dotseg & no_index


def normalize_url_expr(url: Column | str) -> Column:
    """Canonical CDC key as a JVM expression (see module docstring).

    The full normalize chain (~10 regexes + interpreted HOF folds,
    measured ~14 us/url) runs ONLY for URLs that are not already
    canonical: web-crawl change streams are dominated by URLs that are
    fixed points of the normalizer, and CaseWhen evaluates branches
    lazily, so the common case pays one linear regex + a few byte
    scans (measured ~7x cheaper on the synthetic stream).
    """
    # The dispatch deliberately does NOT use ``_let``: higher-order
    # functions are CodegenFallback, so a top-level ``_let`` forces the
    # WHOLE CaseWhen — fast path included — into interpreted eval,
    # which allocates per node and was measured to scale only ~1.8x
    # from 1 to 4 cores (the worst scaler in the CDC apply pipeline).
    #
    # The fast guard runs on the RAW column, not on ``trim(url)``:
    # expression trees have no common-subexpression elimination inside
    # conditional (CaseWhen) branches, so every one of the guard's ~8
    # references to the scheme-stripped slice would re-evaluate the
    # trim.  Running raw is exact, not approximate: the guard rejects
    # ASCII whitespace ANYWHERE (leading ws breaks the scheme prefix,
    # ws after the scheme is in the host class or the forbidden path
    # set), so raw acceptance == trimmed acceptance AND acceptance
    # implies trim(u) == u.  URLs with surrounding whitespace simply
    # take the slow branches, which trim as before.
    raw = F.col(url) if isinstance(url, str) else url
    u0 = F.trim(raw)
    return (
        F.when(raw.isNull(), F.lit(None).cast("string"))
        .when(_fast_canonical(raw), raw)
        .when(
            u0.rlike(_SIMPLE_URL_RE),
            _let(u0, lambda u: F.coalesce(_assemble(u), u)),
        )
        .otherwise(u0)
    )
