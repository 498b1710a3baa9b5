"""External-catalog CAS pointer: commit protocol against a separate
HTTP process (lake/catalog_http.py).

The plain-PUT pointer argument (fileio.py) says CAS is optional; these
tests run the deployment shape where it is NOT — the pointer lives in
a catalog whose PUT is conditional — and exercise the retry-on-CAS-
failure path that plain-PUT IOs can never hit.
"""

import os
import threading

import pytest
from pyspark.sql.types import StructType

from giraffe_etl_spark.lake import (
    CasConflict,
    CatalogServer,
    HttpCatalogIO,
    Table,
)


@pytest.fixture()
def catalog():
    with CatalogServer() as srv:
        yield srv


def make_table(spark, root, io, n_buckets=4):
    schema = StructType.fromDDL("k string, v long")
    return Table.create(
        spark, os.path.join(root, "t"), schema, bucket_key="k",
        n_buckets=n_buckets, io=io,
    )


def kv_df(spark, pairs):
    return spark.createDataFrame(pairs, "k string, v long")


def test_roundtrip_through_catalog_pointer(spark, tmp_root, catalog):
    """Create/append/read with the pointer in the catalog process and
    manifests on POSIX; a second handle loads purely via the catalog."""
    io = HttpCatalogIO(catalog.url)
    t = make_table(spark, tmp_root, io)
    t.append(kv_df(spark, [("a", 1), ("b", 2)]))
    t2 = Table.load(spark, t.path, io=HttpCatalogIO(catalog.url))
    assert {(r.k, r.v) for r in t2.read().collect()} == {("a", 1), ("b", 2)}
    # the pointer really lives in the catalog, not on disk
    assert not os.path.exists(os.path.join(t.meta_dir, "_current"))
    assert io.read_text(os.path.join(t.meta_dir, "_current")).strip() == "1"


def test_cas_rejects_stale_expected(catalog):
    io = HttpCatalogIO(catalog.url)
    ptr = "/tbl/_meta/_current"
    io.flip_pointer(ptr, "0", expected=None)
    io.flip_pointer(ptr, "1", expected="0")
    with pytest.raises(CasConflict):
        io.flip_pointer(ptr, "7", expected="0")  # stale expected
    with pytest.raises(CasConflict):
        io.flip_pointer(ptr, "0", expected=None)  # exists already
    assert io.read_text(ptr) == "1"
    assert catalog.cas_failures == 2


def test_cas_failure_retries_and_lands(spark, tmp_root, catalog, monkeypatch):
    """Writer W1 passes the parent check, then parks BEFORE its pointer
    CAS while writer W2 reaps W1's manifest (stall > grace), re-creates
    the slot and flips the pointer.  W1's CAS must be REJECTED by the
    catalog (412), its cleanup must not touch W2's manifest, and its
    retry must land on top — the exact interleave the plain-PUT pointer
    can't detect at flip time."""
    io1 = HttpCatalogIO(catalog.url)
    t1 = make_table(spark, tmp_root, io1)
    t1.append(kv_df(spark, [("a", 1)]))
    base = t1.current_snapshot()

    parked = threading.Event()
    resume = threading.Event()
    fired = []

    def park_hook(point):
        if point == "pre_flip" and not fired:
            fired.append(point)
            parked.set()
            assert resume.wait(30), "test deadlock"

    t1._test_park_hook = park_hook
    w1_err = []

    def w1():
        try:
            t1.append(kv_df(spark, [("w1", 100)]))
        except Exception as e:
            w1_err.append(e)

    th = threading.Thread(target=w1)
    th.start()
    assert parked.wait(30), "W1 never reached pre_flip"

    failures_before = catalog.cas_failures
    monkeypatch.setattr(Table, "ORPHAN_GRACE_S", 0.0)
    t2 = Table.load(spark, t1.path, io=HttpCatalogIO(catalog.url))
    w2_snap = t2.append(kv_df(spark, [("w2", 200)]))
    assert w2_snap.snapshot_id == base.snapshot_id + 1

    resume.set()
    th.join(60)
    assert not th.is_alive()
    assert not w1_err, w1_err
    # the catalog really rejected W1's conditional PUT at least once
    assert catalog.cas_failures > failures_before

    final = t1.current_snapshot()
    assert final.snapshot_id == base.snapshot_id + 2
    assert final.parent_id == w2_snap.snapshot_id
    assert {(r.k, r.v) for r in t1.read().collect()} == {
        ("a", 1), ("w1", 100), ("w2", 200),
    }
    t2.snapshot_at(w2_snap.snapshot_id)  # W2's manifest intact


def test_racing_appenders_through_catalog(spark, tmp_root, catalog):
    """Two writer threads race real commits through the catalog CAS;
    every append must land exactly once (optimistic retry absorbs the
    conflicts) and history must stay a parent-linked chain."""
    t = make_table(spark, tmp_root, HttpCatalogIO(catalog.url))
    errs = []

    def writer(tag):
        try:
            h = Table.load(spark, t.path, io=HttpCatalogIO(catalog.url))
            for i in range(3):
                h.append(kv_df(spark, [(f"{tag}{i}", i)]))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(tag,)) for tag in "xy"]
    for th in threads:
        th.start()
    for th in threads:
        th.join(300)
    assert not errs, errs
    rows = {r.k for r in t.read().collect()}
    assert rows == {"x0", "x1", "x2", "y0", "y1", "y2"}
    # chain check: walk parents from current back to 0
    snap = t.current_snapshot()
    assert snap.snapshot_id == 6
    seen = []
    while snap.parent_id is not None:
        seen.append(snap.snapshot_id)
        snap = t.snapshot_at(snap.parent_id)
    assert seen == [6, 5, 4, 3, 2, 1]
