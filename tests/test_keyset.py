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


class TestPersistentKeyset:
    """BDBNumberedKeyset analog: assign-or-get across runs."""

    def _ks(self, spark, tmp_root):
        from giraffe_etl_spark.operators.keyset import PersistentKeyset

        import os
        return PersistentKeyset(spark, os.path.join(tmp_root, "dict"))

    def test_cross_batch_stability(self, spark, tmp_root):
        ks = self._ks(spark, tmp_root)
        b1 = spark.createDataFrame([("b",), ("a",), ("c",)], "key string")
        got1 = {r.key: r.dense_id for r in ks.assign_or_get(b1).collect()}
        assert got1 == {"a": 0, "b": 1, "c": 2}  # sorted-key order
        # second batch: existing keys keep ids, new keys extend
        b2 = spark.createDataFrame([("c",), ("e",), ("d",), (None,)], "key string")
        got2 = {r.key: r.dense_id for r in ks.assign_or_get(b2).collect()}
        assert got2 == {"c": 2, "d": 3, "e": 4}

    def test_replay_is_idempotent(self, spark, tmp_root):
        ks = self._ks(spark, tmp_root)
        b = spark.createDataFrame([("x",), ("y",)], "key string")
        first = {r.key: r.dense_id for r in ks.assign_or_get(b).collect()}
        again = {r.key: r.dense_id for r in ks.assign_or_get(b).collect()}
        assert first == again
        assert ks.lookup().count() == 2

    def test_reopen_resumes_dictionary(self, spark, tmp_root):
        ks = self._ks(spark, tmp_root)
        ks.assign_or_get(spark.createDataFrame([("k1",)], "key string"))
        # a fresh keyset over the same path sees the committed state
        ks2 = self._ks(spark, tmp_root)
        got = {
            r.key: r.dense_id
            for r in ks2.assign_or_get(
                spark.createDataFrame([("k1",), ("k0",)], "key string")
            ).collect()
        }
        assert got == {"k1": 0, "k0": 1}


def test_assign_or_get_scans_only_touched_buckets(spark, tmp_root):
    """The dictionary is read ONLY through the bucket transform: a
    batch's keys prune the scan to their buckets' files, and new keys'
    ids come from the commit's own added files — never a full
    dictionary re-scan (O(dictionary) per batch at 1e9 urls)."""
    import os

    from giraffe_etl_spark.operators.keyset import PersistentKeyset

    ks = PersistentKeyset(spark, os.path.join(tmp_root, "dict"), n_buckets=8)
    seed = spark.createDataFrame([(f"k{i}",) for i in range(64)], "key string")
    ks.assign_or_get(seed)
    pre = ks.table.current_snapshot()
    pre_paths = {fi["path"] for fs in pre.buckets.values() for fi in fs}

    batch = spark.createDataFrame([("k3",), ("k17",), ("brand-new",)], "key string")
    out = ks.assign_or_get(batch)
    got = {r.key: r.dense_id for r in out.collect()}
    full = {r.key: r.dense_id for r in ks.lookup().collect()}
    assert got == {k: full[k] for k in ("k3", "k17", "brand-new")}
    assert got["brand-new"] == 64  # extends past the 64 seeded ids

    post = ks.table.current_snapshot()
    touched = {str(b) for b in ks.table.bucket_of("k3", "k17", "brand-new")}
    allowed = {
        fi["path"] for b in touched for fi in pre.buckets.get(b, [])
    } | {
        fi["path"]
        for fs in post.buckets.values()
        for fi in fs
        if fi["path"] not in pre_paths
    }
    scanned = {
        f.replace("file://", "").replace("file:", "") for f in out.inputFiles()
    }
    assert scanned <= allowed, scanned - allowed
    # and it genuinely pruned: untouched buckets' files were not read
    assert len(scanned) < len(pre_paths), (len(scanned), len(pre_paths))
