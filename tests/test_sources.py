"""CSV round-trip + corrupt routing; JDBC reader option wiring."""

from __future__ import annotations

import pytest

from giraffe_etl_spark.sources import jdbc_reader, read_csv_quarantined, write_csv


def test_csv_roundtrip_with_escaping(spark, tmp_root):
    rows = [
        (1, 'plain'),
        (2, 'has,comma'),
        (3, 'has"quote'),
        (4, 'has\nnewline'),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id int, v string")
    path = tmp_root + "/csv"
    write_csv(df, path)
    parsed, quarantined = read_csv_quarantined(
        spark, path, "id int, v string", header=True, multiline=True
    )
    got = {r["id"]: r["v"] for r in parsed.collect()}
    assert got == dict(rows)
    assert quarantined.count() == 0


def test_csv_corrupt_lines_routed(spark, tmp_root):
    path = tmp_root + "/raw.csv"
    with open(path, "w") as f:
        f.write("1,alpha,2.5\n")
        f.write("not parseable at all -- too few columns\n")
        f.write("3,gamma,9.25\n")
        f.write("x,delta,1.0\n")  # non-int id -> corrupt
    parsed, quarantined = read_csv_quarantined(
        spark, path, "id int, name string, score double"
    )
    ids = sorted(r["id"] for r in parsed.collect())
    assert ids == [1, 3]
    bad = sorted(r["line"] for r in quarantined.collect())
    assert len(bad) == 2
    assert any("delta" in b for b in bad)
    assert any("not parseable" in b for b in bad)


def test_jdbc_reader_wiring(spark):
    r = jdbc_reader(
        spark,
        url="jdbc:postgresql://db.example.org/prod",
        table="pages",
        partition_column="page_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
    )
    # the public contract: reader object configured without touching a DB
    assert r is not None
    with pytest.raises(ValueError, match="requires"):
        jdbc_reader(spark, "jdbc:x", "t", partition_column="c")


def test_csv_streaming_path_has_no_cache(spark, tmp_root):
    """The line-oriented read must not cache/persist the raw input.

    The 100 TB contract: both routes are streaming filters over the
    text scan — no InMemoryRelation anywhere in either plan.
    """
    path = tmp_root + "/raw2.csv"
    with open(path, "w") as f:
        f.write("1,a\nbad-line-no-comma\n")
    parsed, quarantined = read_csv_quarantined(spark, path, "id int, v string")
    for df in (parsed, quarantined):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" not in plan and "InMemoryRelation" not in plan
    assert parsed.count() == 1 and quarantined.count() == 1
