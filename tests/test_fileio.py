"""Object-store FileIO: the commit protocol with no POSIX primitives.

``MemoryObjectStoreIO`` exposes exactly what S3-class stores guarantee
(conditional PUT ``If-None-Match: *``; atomic plain PUT; prefix LIST)
and nothing POSIX (no link, no rename, no real directories).  Running
the same commit/concurrency scenarios the POSIX suite locks in proves
the protocol's portability claim instead of documenting it.
"""

import json
import os
import threading

import pytest
from pyspark.sql.types import StructType

from giraffe_etl_spark.lake import CommitConflict, Table
from giraffe_etl_spark.lake.fileio import MemoryObjectStoreIO

MOR_PROPS = {"merge.key": "k", "merge.order": "v", "stats.cols": "v"}


def make_table(spark, root, io, mor=False, n_buckets=4):
    schema = StructType.fromDDL("k string, v long")
    return Table.create(
        spark,
        os.path.join(root, "t"),
        schema,
        bucket_key="k",
        n_buckets=n_buckets,
        properties=MOR_PROPS if mor else None,
        io=io,
    )


def kv_df(spark, pairs):
    return spark.createDataFrame(pairs, "k string, v long")


# ---- the two primitives, raced directly -------------------------------


def test_create_if_absent_exactly_one_winner():
    io = MemoryObjectStoreIO()
    winners, losers = [], []
    barrier = threading.Barrier(16)

    def contend(i):
        barrier.wait()
        try:
            io.create_if_absent("/t/_meta/v1.json", f"writer-{i}")
            winners.append(i)
        except FileExistsError:
            losers.append(i)

    threads = [threading.Thread(target=contend, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(winners) == 1 and len(losers) == 15
    assert io.read_text("/t/_meta/v1.json") == f"writer-{winners[0]}"


def test_flip_pointer_reads_old_or_new_never_torn():
    io = MemoryObjectStoreIO()
    io.flip_pointer("/t/_meta/_current", "0")
    stop = threading.Event()
    torn = []

    def reader():
        while not stop.is_set():
            v = io.read_text("/t/_meta/_current")
            if v not in ("0", "1"):
                torn.append(v)

    r = threading.Thread(target=reader)
    r.start()
    for i in range(2000):
        io.flip_pointer("/t/_meta/_current", str(i % 2))
    stop.set()
    r.join()
    assert torn == []


def test_list_dir_is_prefix_list_with_delimiter():
    io = MemoryObjectStoreIO()
    io.makedirs("/t/_meta/manifests")
    io.create_if_absent("/t/_meta/v0.json", "{}")
    io.create_if_absent("/t/_meta/manifests/b0-abc.json", "[]")
    assert io.list_dir("/t/_meta") == ["manifests", "v0.json"]
    assert io.list_dir("/t/_meta/manifests") == ["b0-abc.json"]


# ---- the full Table protocol on object-store semantics -----------------


def test_table_lifecycle_on_object_store(spark, tmp_root):
    """Create, append, MOR delta, read, load — metadata never hits disk."""
    io = MemoryObjectStoreIO()
    t = make_table(spark, tmp_root, io, mor=True)
    t.append(kv_df(spark, [("a", 1), ("b", 2)]))
    t.append_deltas(
        list(range(4)), t._with_bucket(kv_df(spark, [("a", 5)]))
    )
    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {("a", 5), ("b", 2)}
    # ALL metadata lives in the object store: nothing under _meta on disk
    assert not os.path.exists(t.meta_dir)
    # ...but the data files are real parquet on the local FS
    assert os.path.isdir(t.data_dir)
    # a fresh handle over the same store sees the same table
    t2 = Table.load(spark, t.path, io=io)
    assert {(r.k, r.v) for r in t2.read().collect()} == got


def test_create_exclusivity_on_object_store(spark, tmp_root):
    io = MemoryObjectStoreIO()
    make_table(spark, tmp_root, io)
    with pytest.raises(FileExistsError):
        make_table(spark, tmp_root, io)


def test_concurrent_appends_retry_on_object_store(spark, tmp_root):
    """Two appends from the same stale base: loser re-merges, nothing lost."""
    io = MemoryObjectStoreIO()
    t = make_table(spark, tmp_root, io)
    t.append(kv_df(spark, [("a", 1)]))
    stale = t.current_snapshot()
    t.append(kv_df(spark, [("b", 2)]))
    snap = t.append(kv_df(spark, [("c", 3)]), base=stale)
    assert snap.parent_id == stale.snapshot_id + 1
    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {("a", 1), ("b", 2), ("c", 3)}


def test_cow_aborts_on_touched_bucket_on_object_store(spark, tmp_root):
    io = MemoryObjectStoreIO()
    t = make_table(spark, tmp_root, io, mor=True)
    t.append(kv_df(spark, [(f"k{i}", i) for i in range(8)]))
    stale = t.current_snapshot()
    all_b = [int(b) for b in stale.buckets]
    content = t.read(snap=stale, with_bucket_col=True)
    t.append_deltas(list(range(4)), t._with_bucket(kv_df(spark, [("k0", 99)])))
    with pytest.raises(CommitConflict, match="changed during a copy-on-write"):
        t.overwrite_buckets(all_b, content, base=stale)
    assert ("k0", 99) in {(r.k, r.v) for r in t.read().collect()}


def test_crash_orphan_manifest_reaped_on_object_store(spark, tmp_root, monkeypatch):
    """A writer that died between manifest PUT and pointer flip is adopted past."""
    io = MemoryObjectStoreIO()
    t = make_table(spark, tmp_root, io)
    t.append(kv_df(spark, [("a", 1)]))
    cur = t.current_snapshot()
    # simulate the crash: the next snapshot id's manifest exists, pointer unmoved
    orphan = {
        "format": 2,
        "snapshot_id": cur.snapshot_id + 1,
        "parent_id": cur.snapshot_id,
        "schema_id": cur.schema_id,
        "schemas": {"0": cur.schema_fields},
        "buckets": {},
        "deltas": {},
        "properties": cur.properties,
        "summary": {},
    }
    io.create_if_absent(
        os.path.join(t.meta_dir, f"v{cur.snapshot_id + 1}.json"),
        json.dumps(orphan),
    )
    monkeypatch.setattr(Table, "ORPHAN_GRACE_S", 0.0)
    snap = t.append(kv_df(spark, [("b", 2)]))  # must reap + proceed
    assert snap.snapshot_id == cur.snapshot_id + 1
    assert {(r.k, r.v) for r in t.read().collect()} == {("a", 1), ("b", 2)}


def test_expire_snapshots_reaps_store_objects(spark, tmp_root):
    io = MemoryObjectStoreIO()
    t = make_table(spark, tmp_root, io)
    for i in range(5):
        t.append(kv_df(spark, [(f"k{i}", i)]))
    before = len(io.list_dir(t.meta_dir))
    stats = t.expire_snapshots(keep_last=2, orphan_min_age_s=0)
    assert stats["snapshots_expired"] > 0
    assert len(io.list_dir(t.meta_dir)) < before
    assert t.read().count() == 5  # current content intact


# ---- stalled-writer vs reaper race (round-5 corruption fix) -----------


@pytest.mark.parametrize("io_kind", ["posix", "object_store"])
def test_stalled_writer_never_deletes_successor_manifest(
    spark, tmp_root, monkeypatch, io_kind
):
    """Corruption-class race from the round-4 verdict: writer W1 creates
    v{N}.json then stalls past ORPHAN_GRACE_S before its parent check
    (GC pause / hypervisor steal).  Writer W2 reaps W1's manifest as an
    orphan, re-creates v{N}.json and flips the pointer.  W1 resumes,
    sees the moved pointer, and — before the fix — blindly deleted
    W2's LIVE committed manifest, stranding ``_current`` at a missing
    file.  The writer-nonce owner-checked delete (delete_if_matches)
    makes W1's cleanup a no-op; W1's retry then lands on top of W2.

    Asserted on BOTH FileIOs: posix (read-compare-delete) and the
    object store (atomic compare-and-delete)."""
    io = None if io_kind == "posix" else MemoryObjectStoreIO()
    root = os.path.join(tmp_root, io_kind)
    os.makedirs(root, exist_ok=True)
    t1 = make_table(spark, root, io)
    t1.append(kv_df(spark, [("a", 1)]))
    base = t1.current_snapshot()

    parked = threading.Event()
    resume = threading.Event()
    fired = []

    def park_hook(point):
        if point == "post_create" and not fired:
            fired.append(point)
            parked.set()
            assert resume.wait(30), "test deadlock: W1 never resumed"

    t1._test_park_hook = park_hook
    w1_result, w1_err = [], []

    def w1():
        try:
            w1_result.append(t1.append(kv_df(spark, [("w1", 100)])))
        except Exception as e:  # pragma: no cover - fail loudly below
            w1_err.append(e)

    th = threading.Thread(target=w1)
    th.start()
    assert parked.wait(30), "W1 never reached the park point"

    # W1 is stalled between manifest create and parent check.  Make the
    # grace period elapse instantly and run W2 end-to-end: it must reap
    # W1's manifest, re-create the slot, and commit.
    monkeypatch.setattr(Table, "ORPHAN_GRACE_S", 0.0)
    t2 = Table.load(spark, t1.path, io=io)
    w2_snap = t2.append(kv_df(spark, [("w2", 200)]))
    assert w2_snap.snapshot_id == base.snapshot_id + 1

    resume.set()
    th.join(60)
    assert not th.is_alive()
    assert not w1_err, w1_err

    # W2's committed manifest must have survived W1's conflict cleanup,
    # and W1's retry must have landed AFTER it — nothing lost.
    final = t1.current_snapshot()
    assert final.snapshot_id == base.snapshot_id + 2
    assert final.parent_id == w2_snap.snapshot_id
    # the table is readable and both writers' rows are present
    assert {(r.k, r.v) for r in Table.load(spark, t1.path, io=io).read().collect()} == {
        ("a", 1),
        ("w1", 100),
        ("w2", 200),
    }
    # W2's manifest file itself is still present (history intact)
    t2.snapshot_at(w2_snap.snapshot_id)
