"""Typed conversion, raw-line ingestion, rule classifier, enrichment+TTL.

Covers the round-2 operator additions (VERDICT r01 'What's missing'
items 1-6): importConversion semantics, TokenizerImporter semantics,
the UserAgent rule-table classifier (expr and broadcast-join strategies
must agree, and swapping the rule table changes the outcome), the
GeoIP broadcast enrichment, and HostNameResolver TTL recompute (fresh
rows must pass through untouched).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from giraffe_etl_spark.cdc.convert import (
    FieldSpec,
    convert_typed,
    split_conversion_errors,
)
from giraffe_etl_spark.functions.httpline import parse_http_get
from giraffe_etl_spark.operators.classify import (
    DEFAULT_RULES,
    classify_expr,
    classify_join,
    rules_df,
)
from giraffe_etl_spark.operators.enrich import (
    GEO_FIELDS,
    enrich_hosts,
    geo_table,
    reenrich_stale,
)
from giraffe_etl_spark.operators.weblog import parse_weblog, weblog_stats


# ---- typed conversion -------------------------------------------------------

def _conv(spark, rows, specs, keep=("rid",)):
    df = spark.createDataFrame(rows, "rid int, a string, b string, c string")
    return convert_typed(df, specs, keep=keep)


def test_convert_cast_matrix(spark):
    specs = [
        FieldSpec("x", "bigint", source="a"),
        FieldSpec("y", "double", source="b", default=0.5),
        FieldSpec("t", "timestamp", source="c", fmt="yyyy-MM-dd HH:mm:ss"),
    ]
    rows = [
        (0, "7", "1.5", "2024-01-02 03:04:05"),      # all clean
        (1, "bad", "1.5", "2024-01-02 03:04:05"),    # x fails -> error
        (2, "7", "bad", "2024-01-02 03:04:05"),      # y fails -> default
        (3, "7", "1.5", "nope"),                     # t fails -> error
        (4, None, None, None),                       # nulls are NOT errors
        (5, "bad", "bad", "nope"),                   # multi-failure
    ]
    got = {r["rid"]: r for r in _conv(spark, rows, specs).collect()}
    assert got[0]["x"] == 7 and got[0]["y"] == 1.5 and got[0]["_errors"] == []
    assert got[0]["t"] == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert got[1]["x"] is None and got[1]["_errors"] == ["cast:x"]
    assert got[2]["y"] == 0.5 and got[2]["_errors"] == []
    assert got[3]["t"] is None and got[3]["_errors"] == ["cast:t"]
    assert got[4]["x"] is None and got[4]["_errors"] == []
    assert got[5]["_errors"] == ["cast:x", "cast:t"] and got[5]["y"] == 0.5


def test_convert_error_split(spark):
    specs = [FieldSpec("x", "bigint", source="a")]
    rows = [(0, "1", "", ""), (1, "z", "", ""), (2, "3", "", "")]
    ok, bad = split_conversion_errors(_conv(spark, rows, specs))
    assert sorted(r["x"] for r in ok.collect()) == [1, 3]
    assert [r["rid"] for r in bad.collect()] == [1]
    assert "_errors" not in ok.columns


def test_convert_unknown_type_fails_at_plan_time(spark):
    df = spark.createDataFrame([(1, "x", "", "")], "rid int, a string, b string, c string")
    with pytest.raises(ValueError, match="no conversion"):
        convert_typed(df, [FieldSpec("x", "mapofstuff", source="a")])


# ---- weblog raw-line ingestion ---------------------------------------------

WEBLOG_LINES = [
    'h1.example.org - alice [01/Jan/2024:10:00:00 +0000] "GET /a HTTP/1.1" 200 123',
    'h1.example.org - - [01/Jan/2024:10:00:01 +0000] "POST /b HTTP/1.1" 404 0',
    "totally not a log line",
    'h2.example.org - bob [01/Jan/2024:10:00:02 +0000] "GET /c HTTP/1.0" 200 -',
]


def test_weblog_parse_fields_and_corrupt_route(spark):
    df = spark.createDataFrame([(l,) for l in WEBLOG_LINES], "line string")
    rows = {r["line"]: r for r in parse_weblog(df).collect()}
    ok = rows[WEBLOG_LINES[0]]
    assert (ok["host"], ok["method"], ok["path"], ok["status"], ok["n_bytes"]) == (
        "h1.example.org", "GET", "/a", 200, 123,
    )
    assert rows[WEBLOG_LINES[1]]["status"] == 404
    bad = rows["totally not a log line"]
    assert bad["_corrupt"] and bad["host"] is None and bad["status"] is None
    dash = rows[WEBLOG_LINES[3]]
    assert dash["n_bytes"] is None  # '-' size token -> null, not corrupt
    assert not dash["_corrupt"]


def test_weblog_stats_counts_discards(spark):
    df = spark.createDataFrame([(l,) for l in WEBLOG_LINES], "line string")
    stats = {
        (r["host"], r["status"]): r["n"] for r in weblog_stats(parse_weblog(df)).collect()
    }
    assert stats[("_corrupt", -1)] == 1
    assert stats[("h1.example.org", 200)] == 1
    assert stats[("h1.example.org", 404)] == 1
    assert stats[("h2.example.org", 200)] == 1


# ---- HttpGet request-line --------------------------------------------------

def test_httpget_parse_and_url_synthesis(spark):
    rows = [
        ("www.Example.org,GET /a/b/../c?z=1&a=2 HTTP/1.0",),
        ("h7.example.org,HEAD /x HTTP/1.1",),
        ("h8.example.org,GET /only-two-tokens",),
        ("garbage",),
    ]
    df = spark.createDataFrame(rows, "line string")
    s = parse_http_get(F.col("line"))
    got = df.select(
        "line", s["host"].alias("h"), s["method"].alias("m"),
        s["document"].alias("d"), s["protocol"].alias("p"), s["url"].alias("u"),
    ).collect()
    by = {r["line"]: r for r in got}
    r0 = by[rows[0][0]]
    assert (r0["h"], r0["m"], r0["d"], r0["p"]) == (
        "www.Example.org", "GET", "/a/b/../c?z=1&a=2", "HTTP/1.0",
    )
    # synthesized URL is normalized: www. stripped, .. folded, query sorted
    assert r0["u"] == "http://example.org/a/c?a=2&z=1"
    assert by[rows[1][0]]["m"] == "HEAD" and by[rows[1][0]]["u"] == "http://h7.example.org/x"
    assert by[rows[2][0]]["p"] is None  # protocol optional
    assert by["garbage"]["h"] is None and by["garbage"]["u"] is None


# ---- rule-table classifier --------------------------------------------------

UAS = [
    "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0) Safari",
    "Mozilla/5.0 (compatible; Googlebot/2.1; Android)",  # priority: bot wins
    "Mozilla/5.0 (Linux; Android 14)",
    "curl/8.4.0",
    None,
]


def test_classify_expr_first_match_wins(spark):
    df = spark.createDataFrame([(u,) for u in UAS], "ua string")
    cls = classify_expr("ua")
    got = {
        r["ua"]: (r["c"]["family"], r["c"]["os"], r["c"]["device"])
        for r in df.select("ua", cls.alias("c")).collect()
    }
    assert got[UAS[0]] == ("chrome", "windows", "desktop")
    assert got[UAS[1]] == ("safari_mobile", "ios", "mobile")
    assert got[UAS[2]] == ("googlebot", "bot", "bot")
    assert got[UAS[3]] == ("chrome_mobile", "android", "mobile")
    assert got[UAS[4]] == ("unknown", "unknown", "unknown")
    assert got[None] == ("unknown", "unknown", "unknown")


def test_classify_join_matches_expr(spark):
    """Both strategies agree on ALL 13 fields, extracted ones included."""
    from giraffe_etl_spark.operators.classify import OUT_FIELDS

    df = spark.createDataFrame([(i, u) for i, u in enumerate(UAS)], "i int, ua string")
    cls = classify_expr("ua")
    via_expr = {
        r["i"]: tuple(r["c"][f] for f in OUT_FIELDS)
        for r in df.select("i", cls.alias("c")).collect()
    }
    joined = classify_join(df, "ua", rules_df(spark))
    via_join = {
        r["i"]: tuple(r[f] for f in OUT_FIELDS) for r in joined.collect()
    }
    assert via_expr == via_join


def test_classify_scan_matches_expr_and_is_shuffle_free(spark):
    """classify_scan: same answers as the when-chain, zero exchanges."""
    from giraffe_etl_spark.operators.classify import OUT_FIELDS, classify_scan
    from tests.test_plans import n_exchanges, plan_of

    df = spark.createDataFrame([(i, u) for i, u in enumerate(UAS)], "i int, ua string")
    cls = classify_expr("ua")
    via_expr = {
        r["i"]: tuple(r["c"][f] for f in OUT_FIELDS)
        for r in df.select("i", cls.alias("c")).collect()
    }
    scanned = classify_scan(df, "ua")
    via_scan = {
        r["i"]: tuple(r[f] for f in OUT_FIELDS) for r in scanned.collect()
    }
    assert via_expr == via_scan
    plan = plan_of(scanned)
    assert n_exchanges(plan) == 0, plan
    assert "BroadcastHashJoin" not in plan  # no join at all


def test_classify_extracts_fields_from_string(spark):
    """version/os_version/language/model come from capture groups, not
    constants (UserAgent.java:44-59 extraction-depth analog)."""
    df = spark.createDataFrame(
        [
            ("Mozilla/5.0 (Linux; Android 14; Pixel 8) [de-de] Chrome/120.0",),
            ("Mozilla/5.0 (Linux; Android 13; SM-G991B) Chrome/119.0",),
        ],
        "ua string",
    )
    got = [r["c"] for r in df.select(classify_expr("ua").alias("c")).collect()]
    assert (got[0]["version"], got[0]["os_version"], got[0]["model"],
            got[0]["language"]) == ("120.0", "14", "Pixel 8", "de-de")
    assert (got[1]["version"], got[1]["os_version"], got[1]["model"],
            got[1]["language"]) == ("119.0", "13", "SM-G991B", None)


def test_classify_rule_table_swap(spark):
    """Rules are data: swapping the table reclassifies without code."""
    df = spark.createDataFrame([("curl/8.4.0",)], "ua string")
    swapped = [
        {"priority": 1, "pattern": "curl", "family": "curl", "os": "cli", "device": "tool"},
    ]
    r_default = df.select(classify_expr("ua").alias("c")).collect()[0]["c"]
    r_swapped = df.select(classify_expr("ua", swapped).alias("c")).collect()[0]["c"]
    assert r_default["family"] == "unknown"
    assert r_swapped["family"] == "curl" and r_swapped["device"] == "tool"
    j = classify_join(df, "ua", rules_df(spark, swapped)).collect()[0]
    assert j["family"] == "curl"


# ---- enrichment + TTL -------------------------------------------------------

def test_enrich_hosts_broadcast_lookup(spark):
    geo = geo_table(spark, n_hosts=10)
    df = spark.createDataFrame(
        [("host3.example.org",), ("host99.example.org",)], "host string"
    )
    got = {r["host"]: r for r in enrich_hosts(df, geo).collect()}
    hit = got["host3.example.org"]
    assert (hit["country"], hit["region"], hit["asn"], hit["org"]) == (
        "jp", "r3", 64515, "org3",
    )
    miss = got["host99.example.org"]
    assert all(miss[f] is None for f in GEO_FIELDS)
    # 7-field parity (GeoIPResolver.java:33-133 analog)
    assert len(GEO_FIELDS) == 7
    assert (hit["city"], hit["latitude"], hit["longitude"]) == ("c3", -86.5, -176.5)


def test_enrich_hosts_unmatched_route(spark):
    """unmatched='route' splits misses to a dead-letter side."""
    geo = geo_table(spark, n_hosts=10)
    df = spark.createDataFrame(
        [("host3.example.org",), ("host99.example.org",)], "host string"
    )
    matched, missed = enrich_hosts(df, geo, unmatched="route")
    assert [r["host"] for r in matched.collect()] == ["host3.example.org"]
    assert [r["host"] for r in missed.collect()] == ["host99.example.org"]
    assert missed.columns == ["host"]  # original row shape, no null geo


def test_reenrich_stale_ttl(spark):
    """Only stale rows are recomputed; fresh rows pass untouched."""
    geo = geo_table(spark, n_hosts=10)
    t_old = dt.datetime(2024, 1, 1)
    t_fresh = dt.datetime(2024, 1, 9)
    now = dt.datetime(2024, 1, 10)
    base = spark.createDataFrame(
        [
            ("host1.example.org", "STALE-COUNTRY", "r?", "c?", 0.0, 0.0, 0, "o?", t_old),
            ("host2.example.org", "keepme", "rk", "ck", 1.5, 2.5, 42, "ok", t_fresh),
        ],
        "host string, country string, region string, city string, "
        "latitude double, longitude double, asn bigint, org string, "
        "enriched_at timestamp",
    )
    out = {
        r["host"]: r
        for r in reenrich_stale(base, geo, now=now, ttl_seconds=3 * 86400).collect()
    }
    stale = out["host1.example.org"]
    assert stale["country"] == "de" and stale["asn"] == 64513
    assert stale["enriched_at"] == now
    fresh = out["host2.example.org"]
    assert fresh["country"] == "keepme" and fresh["asn"] == 42
    assert fresh["enriched_at"] == t_fresh


# ---- rDNS analog ------------------------------------------------------------

def test_rdns_udf_expr_parity_and_dot_strip(spark):
    """UDF and codegen-expr resolvers agree; ONE trailing dot stripped.

    The raw synthetic PTR answer carries the trailing dot a real zone
    returns (DNSResolver.java:36-55 strips it); both execution modes
    must emit the dotless form.
    """
    from giraffe_etl_spark.operators.rdns import resolve_hosts

    df = spark.createDataFrame(
        [("10.0.1.7",), ("192.168.0.255",)], "ip string"
    )
    udf_rows = dict(resolve_hosts(df, "ip", mode="udf").collect())
    expr_rows = dict(resolve_hosts(df, "ip", mode="expr").collect())
    assert udf_rows == expr_rows
    assert udf_rows["10.0.1.7"] == "ptr-10-0-1-7.example.org"
    assert not udf_rows["192.168.0.255"].endswith(".")
