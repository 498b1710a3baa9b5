"""Dense ID assignment (NumberedKeyset analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from giraffe_etl_spark.operators.keyset import dense_ids, dense_ids_ordered


def test_dense_ids_are_dense_and_unique(spark):
    df = spark.range(0, 1000, 1, 7).select(F.col("id").alias("k")).persist()
    try:
        out = dense_ids(df).collect()
        ids = sorted(r["dense_id"] for r in out)
        assert ids == list(range(1000))
    finally:
        df.unpersist()


def test_dense_ids_ordered_matches_row_number(spark):
    rows = [(i, f"g{i % 3}") for i in range(500)]
    df = spark.createDataFrame(rows, "k long, g string")
    got = {
        (r["g"], r["k"]): r["dense_id"]
        for r in dense_ids_ordered(df, ["g", "k"]).collect()
    }
    want = {
        (g, k): rank
        for rank, (g, k) in enumerate(sorted((g, k) for k, g in rows))
    }
    assert got == want


def test_dense_ids_empty(spark):
    df = spark.createDataFrame([], "k long")
    assert dense_ids(df).count() == 0
