"""Exactly-once + resume-from-checkpoint guarantees.

The offset log lives in the pages table's snapshot properties; a batch
commit and its offset advance are one atomic snapshot write.  Replays
of committed batches must be detected no-ops, and a "crashed" process
(simulated by constructing a fresh CdcApplier over the same root) must
resume exactly after the last committed batch.
"""

import pandas as pd

from giraffe_etl_spark.cdc import (
    CdcApplier,
    ChangeGenConfig,
    gen_changes,
    gen_pages,
    oracle_apply,
    read_pages,
    seed_pages,
)

CHANGES_DDL = "lsn long, op string, url string, warc_ts timestamp, html binary"


def chunks(pdf, size):
    return [pdf.iloc[i : i + size] for i in range(0, len(pdf), size)]


def snapshot_state(applier):
    pdf = read_pages(applier.pages).toPandas().sort_values("url").reset_index(drop=True)
    return pdf.drop(columns=["html"])


def test_replayed_batch_is_noop(spark, tmp_root):
    applier = CdcApplier(spark, tmp_root, n_buckets=4)
    cfg = ChangeGenConfig(n_keys=30)
    changes = gen_changes(150, cfg)
    parts = chunks(changes, 50)

    r0 = applier.apply_batch(spark.createDataFrame(parts[0], CHANGES_DDL), batch_id=0)
    assert not r0.skipped
    snap_after_0 = applier.pages.current_snapshot().snapshot_id

    r0b = applier.apply_batch(spark.createDataFrame(parts[0], CHANGES_DDL), batch_id=0)
    assert r0b.skipped
    assert applier.pages.current_snapshot().snapshot_id == snap_after_0  # no commit

    applier.apply_batch(spark.createDataFrame(parts[1], CHANGES_DDL), batch_id=1)
    # replay both already-committed batches out of order: all no-ops
    assert applier.apply_batch(
        spark.createDataFrame(parts[0], CHANGES_DDL), batch_id=0
    ).skipped
    assert applier.apply_batch(
        spark.createDataFrame(parts[1], CHANGES_DDL), batch_id=1
    ).skipped
    applier.apply_batch(spark.createDataFrame(parts[2], CHANGES_DDL), batch_id=2)

    want = oracle_apply(gen_pages(0), changes)
    got = snapshot_state(applier)
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["url"], want.sort_values("url").reset_index(drop=True)["url"],
        check_names=False,
    )


def test_crash_and_resume_converges(spark, tmp_root):
    """Restarted process (new applier over same root) resumes correctly."""
    pages = gen_pages(20)
    cfg = ChangeGenConfig(n_keys=20)
    changes = gen_changes(120, cfg)
    parts = chunks(changes, 40)

    a1 = CdcApplier(spark, tmp_root, n_buckets=4)
    seed_pages(a1.pages, spark.createDataFrame(pages))
    a1.apply_batch(spark.createDataFrame(parts[0], CHANGES_DDL), batch_id=0)
    a1.apply_batch(spark.createDataFrame(parts[1], CHANGES_DDL), batch_id=1)
    # "crash" — a2 is a fresh process over the same table root
    a2 = CdcApplier(spark, tmp_root, n_buckets=4)
    assert a2.last_committed_batch() == 1
    # naive replay from the beginning: 0 and 1 are no-ops, 2 applies
    for b, part in enumerate(parts):
        a2.apply_batch(spark.createDataFrame(part, CHANGES_DDL), batch_id=b)

    want = oracle_apply(pages, changes).sort_values("url").reset_index(drop=True)
    got = snapshot_state(CdcApplier(spark, tmp_root, n_buckets=4))
    assert got["url"].tolist() == want["url"].tolist()
    assert got["text"].tolist() == want["text"].tolist()


def test_offsets_advance_atomically_with_data(spark, tmp_root):
    applier = CdcApplier(spark, tmp_root, n_buckets=4)
    cfg = ChangeGenConfig(n_keys=10)
    changes = gen_changes(30, cfg)
    applier.apply_batch(
        spark.createDataFrame(changes, CHANGES_DDL), batch_id=0, lsn_range=(0, 89)
    )
    props = applier.pages.properties
    assert props["stream.default.last_batch"] == "0"
    assert props["stream.default.last_lsn"] == "89"
    # the SAME snapshot holds the data files and the offsets (MOR
    # commits the batch as delta files; cow would rewrite base files)
    snap = applier.pages.current_snapshot()
    assert snap.deltas or snap.buckets, "data committed in offset-bearing snapshot"
    n_rows = sum(
        fi["rows"] for m in (snap.deltas, snap.buckets) for fs in m.values() for fi in fs
    )
    assert n_rows > 0


def test_metrics_lineage_recorded(spark, tmp_root):
    applier = CdcApplier(spark, tmp_root, n_buckets=4)
    cfg = ChangeGenConfig(n_keys=20, malformed_frac=0.1)
    changes = gen_changes(100, cfg)
    res = applier.apply_batch(spark.createDataFrame(changes, CHANGES_DDL), batch_id=0)
    m = applier.metrics.read().toPandas()
    stages = set(m["stage"])
    assert {"input", "quarantined", "winners", "applied"} <= stages
    assert m[m.stage == "input"]["rows"].iloc[0] == 100
    assert m[m.stage == "quarantined"]["rows"].iloc[0] == res.rows_quarantined
    applied = m[m.stage == "applied"]
    assert applied["rows"].sum() >= res.rows_winners  # per-bucket lineage
    assert (applied["bucket"].notna()).all()
