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


def test_jdbc_live_derby_ingest(spark, tmp_root):
    """LIVE end-to-end JDBC ingest, no mocks: an in-process Apache Derby
    database (the embedded DB Spark ships for its Hive metastore, so the
    driver is already on every classpath) is created, loaded, and read
    back through the partitioned ``jdbc_reader`` plan — then applied as
    a CDC batch, proving JDBC can feed the same apply path as the binlog
    sources.  Closes the SURVEY §2.1 JDBCReader row (JDBCReader.java:
    28-103, behavior studied — not ported)."""
    import datetime as dt

    from giraffe_etl_spark.cdc import CdcApplier
    from giraffe_etl_spark.cdc.apply import read_pages

    db = tmp_root + "/derbydb"
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.executeUpdate(
            "CREATE TABLE changes (lsn BIGINT PRIMARY KEY, op VARCHAR(1), "
            "url VARCHAR(200), warc_ts TIMESTAMP, html BLOB)"
        )
        ps = conn.prepareStatement(
            "INSERT INTO changes VALUES (?, ?, ?, ?, ?)"
        )
        for i in range(120):
            ps.setLong(1, i)
            ps.setString(2, "D" if i % 17 == 0 else ("U" if i % 3 == 0 else "I"))
            ps.setString(3, f"http://host{(i % 40) % 7}.example.org/page/{i % 40}")
            ps.setTimestamp(
                4, jvm.java.sql.Timestamp.valueOf(f"2026-01-01 00:{i // 60:02d}:{i % 60:02d}")
            )
            if i % 17 == 0:
                ps.setNull(5, jvm.java.sql.Types.BLOB)
            else:
                ps.setBytes(5, bytearray(f"<p>row {i}</p>".encode()))
            ps.addBatch()
        ps.executeBatch()
        conn.commit()
    finally:
        conn.close()

    df = jdbc_reader(
        spark,
        url=f"jdbc:derby:{db}",
        table="changes",
        partition_column="lsn",
        lower_bound=0,
        upper_bound=120,
        num_partitions=4,
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    ).load()
    df = df.toDF(*[c.lower() for c in df.columns])  # Derby uppercases names
    # the partitioned fan-out is real: one scan partition per lsn range
    assert df.rdd.getNumPartitions() == 4
    rows = df.orderBy("lsn").collect()
    assert len(rows) == 120
    assert rows[5]["url"] == "http://host5.example.org/page/5"  # 5 % 40 = 5
    assert bytes(rows[1]["html"]) == b"<p>row 1</p>"

    # feed the SAME frame into the apply path: JDBC is just another source
    ap = CdcApplier(spark, tmp_root + "/jdbc_pages", n_buckets=4)
    res = ap.apply_batch(df.select("lsn", "op", "url", "warc_ts", "html"), batch_id=0)
    assert not res.skipped
    got = read_pages(ap.pages)
    # distinct live urls: 40 keys minus those whose LWW winner is a delete
    assert 0 < got.count() <= 40
    assert set(got.columns) == {"url", "warc_ts", "html", "text", "lang"}


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
