"""Declarative pipeline spec == explicit API wiring (pipeline.py).

The Done criterion from the round-4 verdict (#6): the weblog fixture
pipeline — parse, convert, enrich, error routes (the reference's
`test` process shape, process_definitions.xml:18-261) — expressed
declaratively and pytest-compared to the same result produced via the
explicit API calls.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from giraffe_etl_spark.cdc.convert import (
    FieldSpec,
    convert_typed,
    split_conversion_errors,
)
from giraffe_etl_spark.operators.enrich import enrich_hosts, geo_table
from giraffe_etl_spark.operators.weblog import parse_weblog
from giraffe_etl_spark.pipeline import compile_pipeline, register_task

WEBLOG_LINES = [
    # host0/host1 are present in geo_table(n_hosts=50); host99 is not
    'host0.example.org - alice [01/Jan/2024:10:00:00 +0000] "GET /a HTTP/1.1" 200 123',
    'host1.example.org - - [02/Jan/2024:11:30:00 +0000] "POST /b HTTP/1.1" 404 0',
    'host99.example.org - bob [03/Jan/2024:12:00:00 +0000] "GET /c HTTP/1.0" 200 7',
    "totally not a log line",                                     # -> corrupt route
    'host2.example.org - eve [99/Zzz/2024:99:99:99 +0000] "GET /d HTTP/1.1" 500 1',
    # ^ parses, but the timestamp cannot convert -> conversion_errors route
]

TS_FMT = "dd/MMM/yyyy:HH:mm:ss Z"

SPEC = {
    "name": "test",  # the reference sample process name
    "input": {"kind": "weblog_lines", "column": "line"},
    "keep": ("host", "method", "path", "status", "n_bytes"),
    "convert": [
        {"name": "hit_timestamp", "dtype": "timestamp", "source": "ts_raw",
         "fmt": TS_FMT},
    ],
    "tasks": [
        {"call": "enrich_geo", "host_col": "host", "geo": None},  # filled per-test
        {"call": "with_column", "name": "is_error",
         "expr": "status >= 400"},
    ],
    "routes": {
        "corrupt": "error_discard",
        "conversion_errors": "conversion_errors",
    },
    "output": "fact",
}


def _lines_df(spark):
    return spark.createDataFrame([(l,) for l in WEBLOG_LINES], "line string")


def _spec_with_geo(geo):
    spec = {**SPEC, "tasks": [dict(SPEC["tasks"][0], geo=geo), SPEC["tasks"][1]]}
    return spec


def test_declarative_matches_explicit_wiring(spark):
    geo = geo_table(spark)
    outs = compile_pipeline(_spec_with_geo(geo)).run(_lines_df(spark))
    assert set(outs) == {"fact", "error_discard", "conversion_errors"}

    # explicit wiring of the identical process
    parsed = parse_weblog(_lines_df(spark))
    corrupt = parsed.filter(F.col("_corrupt")).select("line")
    clean = parsed.filter(~F.col("_corrupt")).drop("_corrupt")
    converted = convert_typed(
        clean,
        [FieldSpec("hit_timestamp", "timestamp", source="ts_raw", fmt=TS_FMT)],
        keep=("host", "method", "path", "status", "n_bytes"),
    )
    ok, bad = split_conversion_errors(converted)
    fact = enrich_hosts(ok, geo, host_col="host").withColumn(
        "is_error", F.expr("status >= 400")
    )

    assert outs["fact"].columns == fact.columns
    assert sorted(map(tuple, outs["fact"].collect())) == sorted(
        map(tuple, fact.collect())
    )
    assert sorted(map(tuple, outs["error_discard"].collect())) == sorted(
        map(tuple, corrupt.collect())
    )
    assert sorted(map(tuple, outs["conversion_errors"].collect())) == sorted(
        map(tuple, bad.collect())
    )


def test_routes_carry_the_failures(spark):
    outs = compile_pipeline(_spec_with_geo(geo_table(spark))).run(_lines_df(spark))
    fact = outs["fact"].collect()
    assert {r["host"] for r in fact} == {
        "host0.example.org", "host1.example.org", "host99.example.org",
    }
    # matched hosts got geo fields; the unmatched one got nulls, not dropped
    by_host = {r["host"]: r for r in fact}
    assert by_host["host0.example.org"]["country"] is not None
    assert by_host["host99.example.org"]["country"] is None
    assert by_host["host1.example.org"]["is_error"] is True
    assert [r["line"] for r in outs["error_discard"].collect()] == [
        "totally not a log line"
    ]
    bad = outs["conversion_errors"].collect()
    assert len(bad) == 1 and bad[0]["_errors"] == ["cast:hit_timestamp"]
    assert bad[0]["host"] == "host2.example.org"


def test_when_condition_gates_a_task(spark):
    """dp:condition analog: a task applies only to rows matching
    ``when``; the rest pass through with nulls for created fields."""
    spec = {
        "name": "gated",
        "input": {"kind": "dataframe"},
        "tasks": [
            {"call": "with_column", "name": "flag", "expr": "'hi'",
             "when": "v > 1"},
        ],
        "output": "out",
    }
    df = spark.createDataFrame([(1,), (2,), (3,)], "v int")
    got = {r["v"]: r["flag"] for r in
           compile_pipeline(spec).run(df)["out"].collect()}
    assert got == {1: None, 2: "hi", 3: "hi"}


def test_compile_time_validation():
    with pytest.raises(ValueError, match="unknown task"):
        compile_pipeline({"tasks": [{"call": "nope"}]})
    with pytest.raises(ValueError, match="unknown input kind"):
        compile_pipeline({"input": {"kind": "carrier-pigeon"}})
    with pytest.raises(ValueError, match="collide"):
        compile_pipeline({
            "output": "fact",
            "routes": {"corrupt": "fact"},
        })


def test_custom_task_registration(spark):
    @register_task("double_v")
    def _factory(task):
        return lambda df: df.withColumn("v", F.col("v") * 2)

    spec = {
        "name": "custom",
        "input": {"kind": "dataframe"},
        "tasks": [{"call": "double_v"}],
        "output": "out",
    }
    df = spark.createDataFrame([(2,), (5,)], "v int")
    assert sorted(
        r["v"] for r in compile_pipeline(spec).run(df)["out"].collect()
    ) == [4, 10]
