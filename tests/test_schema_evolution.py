"""Schema evolution across a replay boundary (FIXTURES.md §3).

Add / rename / widen on the target table mid-stream; files written
before the boundary are read under the new schema via column-id
mapping; replay across the boundary reproduces the expected final
state.
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
EVOLVED_DDL = CHANGES_DDL + ", fetch_status int"


def test_add_column_mid_stream(spark, tmp_root):
    applier = CdcApplier(spark, tmp_root, n_buckets=4)
    pages = gen_pages(15)
    cfg = ChangeGenConfig(n_keys=15)
    changes = gen_changes(80, cfg)
    pre, post = changes.iloc[:40], changes.iloc[40:].copy()

    seed_pages(applier.pages, spark.createDataFrame(pages))
    applier.apply_batch(spark.createDataFrame(pre, CHANGES_DDL), batch_id=0)

    # evolution boundary: target gains fetch_status; stream now carries it
    applier.pages.add_column("fetch_status", "int")
    post["fetch_status"] = [200 + (i % 3) for i in range(len(post))]
    applier.apply_batch(spark.createDataFrame(post, EVOLVED_DDL), batch_id=1)

    got = read_pages(applier.pages).toPandas().sort_values("url").reset_index(drop=True)
    assert "fetch_status" in got.columns

    want = oracle_apply(pages, changes).sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["text"].tolist() == want["text"].tolist()

    # rows last-written before the boundary read as null fetch_status;
    # rows won by post-boundary events carry it
    post_urls = set()
    from giraffe_etl_spark.cdc.oracle import validity_reason
    from giraffe_etl_spark.functions import normalize_url
    state = {}
    for r in changes.itertuples(index=False):
        if validity_reason(r.op, r.url, r.warc_ts, r.html) is None:
            k = normalize_url(r.url)
            cur = state.get(k)
            cand = (r.warc_ts, r.lsn)
            if cur is None or cand >= cur:
                state[k] = cand
                post_urls.discard(k)
                if r.lsn >= post["lsn"].iloc[0]:
                    post_urls.add(k)
    for row in got.itertuples(index=False):
        if row.url in post_urls:
            assert row.fetch_status is not None and not pd.isna(row.fetch_status)
        else:
            assert row.fetch_status is None or pd.isna(row.fetch_status)


def test_rename_column_mid_stream(spark, tmp_root):
    applier = CdcApplier(spark, tmp_root, n_buckets=4)
    cfg = ChangeGenConfig(n_keys=10)
    changes = gen_changes(60, cfg)
    applier.apply_batch(spark.createDataFrame(changes.iloc[:30], CHANGES_DDL), batch_id=0)

    applier.pages.rename_column("lang", "language")
    applier.apply_batch(spark.createDataFrame(changes.iloc[30:], CHANGES_DDL), batch_id=1)

    got = read_pages(applier.pages).toPandas().sort_values("url").reset_index(drop=True)
    assert "language" in got.columns and "lang" not in got.columns

    want = oracle_apply(gen_pages(0), changes).sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["language"].tolist() == want["lang"].tolist()  # values preserved


def test_widen_column_mid_stream(spark, tmp_root):
    applier = CdcApplier(spark, tmp_root, n_buckets=4)
    applier.pages.add_column("aux", "int")
    cfg = ChangeGenConfig(n_keys=10)
    changes = gen_changes(40, cfg)
    pre = changes.iloc[:20].copy()
    pre["aux"] = list(range(20))
    applier.apply_batch(
        spark.createDataFrame(pre, CHANGES_DDL + ", aux int"), batch_id=0
    )

    applier.pages.widen_column("aux", "bigint")
    post = changes.iloc[20:].copy()
    post["aux"] = [10_000_000_000 + i for i in range(len(post))]  # needs 64 bits
    applier.apply_batch(
        spark.createDataFrame(post, CHANGES_DDL + ", aux long"), batch_id=1
    )

    got = read_pages(applier.pages).toPandas()
    assert got["aux"].max() >= 10_000_000_000
    want = oracle_apply(gen_pages(0), changes)
    assert len(got) == len(want)


def test_replay_across_boundary_after_restart(spark, tmp_root):
    """Evolution + crash + naive full replay still converges."""
    cfg = ChangeGenConfig(n_keys=12)
    changes = gen_changes(60, cfg)

    a1 = CdcApplier(spark, tmp_root, n_buckets=4)
    a1.apply_batch(spark.createDataFrame(changes.iloc[:20], CHANGES_DDL), batch_id=0)
    a1.pages.add_column("fetch_status", "int")
    mid = changes.iloc[20:40].copy()
    mid["fetch_status"] = 200
    a1.apply_batch(spark.createDataFrame(mid, EVOLVED_DDL), batch_id=1)

    a2 = CdcApplier(spark, tmp_root, n_buckets=4)  # restart
    assert a2.last_committed_batch() == 1
    # full replay: 0, 1 no-op; 2 applies post-evolution
    a2.apply_batch(spark.createDataFrame(changes.iloc[:20], CHANGES_DDL), batch_id=0)
    a2.apply_batch(spark.createDataFrame(mid, EVOLVED_DDL), batch_id=1)
    tail = changes.iloc[40:].copy()
    tail["fetch_status"] = 404
    a2.apply_batch(spark.createDataFrame(tail, EVOLVED_DDL), batch_id=2)

    got = read_pages(a2.pages).toPandas().sort_values("url").reset_index(drop=True)
    want = oracle_apply(gen_pages(0), changes).sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
