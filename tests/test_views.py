"""IncrementalRollup: differential aggregates from changelog pre-images.

The retraction form of incremental view maintenance: 'after' rows add
their contribution, 'before' rows subtract theirs, so the rollup equals
a recompute-from-scratch at every cursor — without a keyed replica and
without re-reading the source's base data.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from giraffe_etl_spark.cdc import IncrementalRollup
from giraffe_etl_spark.cdc.apply import CdcApplier, read_pages, seed_pages
from giraffe_etl_spark.cdc.generate import ChangeGenConfig, gen_changes, gen_pages
from giraffe_etl_spark.lake import Table

CHANGES_DDL = "lsn long, op string, url string, warc_ts timestamp, html binary"

MEASURES = {"n_pages": "1", "chars": "coalesce(length(text), 0)"}


@pytest.fixture()
def src_applier(spark, tmp_root):
    applier = CdcApplier(spark, os.path.join(tmp_root, "src"), n_buckets=8)
    seed_pages(applier.pages, spark.createDataFrame(gen_pages(50)))
    return applier


def _apply(spark, applier, lo, hi, batch_id):
    cfg = ChangeGenConfig(n_keys=50)
    changes = gen_changes(hi, cfg)
    batch = changes[(changes.lsn >= lo * 3) & (changes.lsn < hi * 3)]
    applier.apply_batch(
        spark.createDataFrame(batch, CHANGES_DDL), batch_id=batch_id
    )


def _recompute(pages_table):
    return sorted(
        (r["lang"], r["n_pages"], r["chars"])
        for r in read_pages(pages_table)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_pages"),
            F.sum(F.coalesce(F.length("text"), F.lit(0)))
            .cast("double")
            .alias("chars"),
        )
        .collect()
    )


def _rollup_rows(rollup):
    return sorted(
        (r["lang"], r["n_pages"], r["chars"]) for r in rollup.read().collect()
    )


def test_rollup_tracks_replay_differentially(spark, tmp_root, src_applier):
    """Seed from the non-empty source, then per-batch syncs stay equal
    to recompute-from-scratch through inserts, updates and deletes."""
    rollup = IncrementalRollup(
        spark,
        src_applier.pages,
        os.path.join(tmp_root, "rollup"),
        group_cols=["lang"],
        measures=MEASURES,
    )
    assert _rollup_rows(rollup) == _recompute(src_applier.pages)

    for i, (lo, hi) in enumerate([(0, 100), (100, 200), (200, 300)]):
        _apply(spark, src_applier, lo, hi, i)
        rollup.sync()
        assert _rollup_rows(rollup) == _recompute(src_applier.pages)


def test_rollup_sync_is_idempotent(spark, tmp_root, src_applier):
    _apply(spark, src_applier, 0, 100, 0)
    rollup = IncrementalRollup(
        spark,
        src_applier.pages,
        os.path.join(tmp_root, "rollup"),
        group_cols=["lang"],
        measures=MEASURES,
    )
    before = _rollup_rows(rollup)
    rep = rollup.sync()
    assert rep["commits"] == 0  # cursor already at head
    assert _rollup_rows(rollup) == before
    # a reconstructed rollup over the same path resumes from its cursor
    again = IncrementalRollup(
        spark,
        src_applier.pages,
        os.path.join(tmp_root, "rollup"),
        group_cols=["lang"],
        measures=MEASURES,
    )
    assert _rollup_rows(again) == before


def test_rollup_fully_retracted_group_disappears(spark, tmp_root):
    """When every row of a group is deleted, the group leaves the
    rollup — exactly as a recompute would drop it."""
    schema = StructType.fromDDL(
        "url string, warc_ts long, lang string, _lsn long, _deleted boolean"
    )
    t = Table.create(
        spark,
        os.path.join(tmp_root, "t"),
        schema,
        bucket_key="url",
        n_buckets=2,
        properties={"merge.key": "url", "merge.order": "warc_ts,_lsn"},
    )
    rows = [
        ("u1", 1, "xx", 1, False),
        ("u2", 1, "xx", 2, False),
        ("u3", 1, "yy", 3, False),
    ]
    t.append(spark.createDataFrame(rows, schema))
    rollup = IncrementalRollup(
        spark,
        t,
        os.path.join(tmp_root, "rollup"),
        group_cols=["lang"],
        measures={"n_pages": "1"},
    )
    assert _langs(rollup) == [("xx", 2.0), ("yy", 1.0)]

    dead = [("u1", 2, None, 4, True), ("u2", 2, None, 5, True)]
    t.append_deltas(None, spark.createDataFrame(dead, schema))
    rollup.sync()
    assert _langs(rollup) == [("yy", 1.0)]


def _langs(rollup):
    return sorted((r["lang"], r["n_pages"]) for r in rollup.read().collect())


def test_rollup_seed_crash_is_redone(spark, tmp_root, src_applier, monkeypatch):
    """A crash between Table.create and the seed commit leaves the
    sentinel cursor; reconstruction redoes the seed instead of serving
    an empty rollup that claims to be current."""
    _apply(spark, src_applier, 0, 60, 0)
    path = os.path.join(tmp_root, "rollup")

    def boom(self):
        raise RuntimeError("crash before seed")

    monkeypatch.setattr(IncrementalRollup, "_seed", boom)
    with pytest.raises(RuntimeError, match="crash before seed"):
        IncrementalRollup(
            spark,
            src_applier.pages,
            path,
            group_cols=["lang"],
            measures=MEASURES,
        )
    monkeypatch.undo()

    r = IncrementalRollup(
        spark, src_applier.pages, path, group_cols=["lang"], measures=MEASURES
    )
    assert _rollup_rows(r) == _recompute(src_applier.pages)
    # and subsequent differential syncs work off the redone seed
    _apply(spark, src_applier, 60, 120, 1)
    r.sync()
    assert _rollup_rows(r) == _recompute(src_applier.pages)


def test_rollup_over_empty_source_seeds_then_tracks(spark, tmp_root):
    from giraffe_etl_spark.cdc.apply import CdcApplier as _A

    applier = _A(spark, os.path.join(tmp_root, "src"), n_buckets=4)
    r = IncrementalRollup(
        spark,
        applier.pages,
        os.path.join(tmp_root, "rollup"),
        group_cols=["lang"],
        measures=MEASURES,
    )
    assert _rollup_rows(r) == []
    _apply(spark, applier, 0, 60, 0)
    r.sync()
    assert _rollup_rows(r) == _recompute(applier.pages)


def test_rollup_skips_compaction_restatements(spark, tmp_root, src_applier):
    """With on_rewrite='skip', a source compaction inside the sync
    window contributes nothing (its files restate rows) and the
    differential stays equal to recompute."""
    _apply(spark, src_applier, 0, 100, 0)
    rollup = IncrementalRollup(
        spark,
        src_applier.pages,
        os.path.join(tmp_root, "rollup"),
        group_cols=["lang"],
        measures=MEASURES,
        on_rewrite="skip",
    )
    _apply(spark, src_applier, 100, 200, 1)
    src_applier.pages.compact_deltas(max_delta_files=0)
    _apply(spark, src_applier, 200, 300, 2)
    rollup.sync()
    assert _rollup_rows(rollup) == _recompute(src_applier.pages)


def test_rollup_null_group_value_merges_not_duplicates(spark, tmp_root):
    """A null group value is one group (as groupBy folds it); the
    null-safe outer merge must pair current and delta null-group rows
    instead of leaving duplicates."""
    schema = StructType.fromDDL(
        "url string, warc_ts long, lang string, _lsn long, _deleted boolean"
    )
    t = Table.create(
        spark,
        os.path.join(tmp_root, "t"),
        schema,
        bucket_key="url",
        n_buckets=2,
        properties={"merge.key": "url", "merge.order": "warc_ts,_lsn"},
    )
    t.append(
        spark.createDataFrame(
            [("u1", 1, None, 1, False), ("u2", 1, "yy", 2, False)], schema
        )
    )
    rollup = IncrementalRollup(
        spark,
        t,
        os.path.join(tmp_root, "rollup"),
        group_cols=["lang"],
        measures={"n_pages": "1"},
    )
    def langs():
        return sorted(
            ((r["lang"], r["n_pages"]) for r in rollup.read().collect()),
            key=lambda t: (t[0] is not None, t[0]),
        )

    assert langs() == [(None, 1.0), ("yy", 1.0)]

    # another null-group row arrives: the null group must MERGE to 2,
    # not appear twice
    t.append_deltas(
        None, spark.createDataFrame([("u3", 1, None, 3, False)], schema)
    )
    rollup.sync()
    assert langs() == [(None, 2.0), ("yy", 1.0)]

    # retract one of them
    t.append_deltas(
        None, spark.createDataFrame([("u1", 2, None, 4, True)], schema)
    )
    rollup.sync()
    assert langs() == [(None, 1.0), ("yy", 1.0)]


def test_rollup_zero_netting_group_survives(spark, tmp_root):
    """Group existence tracks the live-row count, not user measures: a
    signed measure netting to exactly 0 is a VALUE, and the group stays
    — as a recompute would report it."""
    schema = StructType.fromDDL(
        "url string, warc_ts long, score long, lang string, "
        "_lsn long, _deleted boolean"
    )
    t = Table.create(
        spark,
        os.path.join(tmp_root, "t"),
        schema,
        bucket_key="url",
        n_buckets=2,
        properties={"merge.key": "url", "merge.order": "warc_ts,_lsn"},
    )
    t.append(
        spark.createDataFrame(
            [
                ("u1", 1, 5, "xx", 1, False),
                ("u2", 1, -5, "xx", 2, False),  # xx nets to 0, 2 live rows
                ("u3", 1, 3, "yy", 3, False),
            ],
            schema,
        )
    )
    rollup = IncrementalRollup(
        spark,
        t,
        os.path.join(tmp_root, "rollup"),
        group_cols=["lang"],
        measures={"net": "score"},
    )
    rows = sorted((r["lang"], r["net"]) for r in rollup.read().collect())
    assert rows == [("xx", 0.0), ("yy", 3.0)]

    # a sync touching only yy must not evict the zero-valued xx group
    t.append_deltas(
        None,
        spark.createDataFrame([("u3", 2, 4, "yy", 4, False)], schema),
    )
    rollup.sync()
    rows = sorted((r["lang"], r["net"]) for r in rollup.read().collect())
    assert rows == [("xx", 0.0), ("yy", 4.0)]

    # deleting BOTH xx rows removes the group (live count hits 0)
    dead = [("u1", 3, None, None, 5, True), ("u2", 3, None, None, 6, True)]
    t.append_deltas(None, spark.createDataFrame(dead, schema))
    rollup.sync()
    rows = sorted((r["lang"], r["net"]) for r in rollup.read().collect())
    assert rows == [("yy", 4.0)]


def test_rollup_reopen_with_different_definition_raises(
    spark, tmp_root, src_applier
):
    _apply(spark, src_applier, 0, 60, 0)
    path = os.path.join(tmp_root, "rollup")
    IncrementalRollup(
        spark, src_applier.pages, path, group_cols=["lang"], measures=MEASURES
    )
    # same definition reopens fine
    IncrementalRollup(
        spark, src_applier.pages, path, group_cols=["lang"], measures=MEASURES
    )
    # a changed measure EXPRESSION must refuse (silent divergence)
    with pytest.raises(ValueError, match="different definition"):
        IncrementalRollup(
            spark,
            src_applier.pages,
            path,
            group_cols=["lang"],
            measures={"n_pages": "2", "chars": MEASURES["chars"]},
        )
    # reserved / colliding measure names fail fast
    with pytest.raises(ValueError, match="measure names"):
        IncrementalRollup(
            spark,
            src_applier.pages,
            os.path.join(tmp_root, "r2"),
            group_cols=["lang"],
            measures={"_rows": "1"},
        )


def test_rollup_expired_cursor_raises_resync_and_reseeds(spark, tmp_root):
    """A cursor behind the source's retention window gets the follower
    contract (ResyncRequired + recovery), not a raw SnapshotExpired;
    reseed() restores equality with recompute."""
    from giraffe_etl_spark.cdc import ResyncRequired

    schema = StructType.fromDDL(
        "url string, warc_ts long, lang string, _lsn long, _deleted boolean"
    )
    t = Table.create(
        spark,
        os.path.join(tmp_root, "t"),
        schema,
        bucket_key="url",
        n_buckets=2,
        properties={"merge.key": "url", "merge.order": "warc_ts,_lsn"},
    )
    rows = lambda xs: spark.createDataFrame(xs, schema)
    t.append(rows([("u1", 1, "xx", 1, False)]))
    rollup = IncrementalRollup(
        spark,
        t,
        os.path.join(tmp_root, "rollup"),
        group_cols=["lang"],
        measures={"n_pages": "1"},
    )
    for i in range(6):  # march the source far past the cursor
        t.append_deltas(None, rows([(f"v{i}", 1, "yy", 10 + i, False)]))
    t.expire_snapshots(keep_last=2, orphan_min_age_s=0.0)

    with pytest.raises(ResyncRequired, match="reseed"):
        rollup.sync()
    rollup.reseed()
    got = sorted((r["lang"], r["n_pages"]) for r in rollup.read().collect())
    assert got == [("xx", 1.0), ("yy", 6.0)]
    # and the reseeded rollup syncs incrementally again
    t.append_deltas(None, rows([("w", 1, "yy", 99, False)]))
    rollup.sync()
    got = sorted((r["lang"], r["n_pages"]) for r in rollup.read().collect())
    assert got == [("xx", 1.0), ("yy", 7.0)]
