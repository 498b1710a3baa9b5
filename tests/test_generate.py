"""Generator determinism + shape tests (FIXTURES.md §1-2)."""

import numpy as np
import pandas as pd

from giraffe_etl_spark.cdc.generate import (
    ChangeGenConfig,
    gen_change_batch,
    gen_changes,
    gen_pages,
)


def test_pages_shape_and_determinism():
    p1 = gen_pages(50)
    p2 = gen_pages(50)
    pd.testing.assert_frame_equal(p1, p2)
    assert list(p1.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert p1["url"].is_unique
    assert all(isinstance(h, bytes) for h in p1["html"])
    assert p1["text"].notna().all()


def test_changes_tiling_invariance():
    """Any tiling of the stream yields identical rows (purity in index)."""
    cfg = ChangeGenConfig(n_keys=40)
    whole = gen_change_batch(cfg, 0, 100)
    parts = pd.concat(
        [gen_change_batch(cfg, s, 20) for s in range(0, 100, 20)],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(whole, parts)


def test_changes_lsn_strictly_monotonic_with_gaps():
    c = gen_changes(500)
    lsn = c["lsn"].to_numpy()
    assert (np.diff(lsn) > 0).all()
    assert (np.diff(lsn) > 1).any()  # gaps exist


def test_changes_op_mix_and_null_html_on_delete():
    c = gen_changes(2000)
    frac_i = (c["op"] == "I").mean()
    frac_d = (c["op"] == "D").mean()
    assert 0.4 < frac_i < 0.6
    assert 0.05 < frac_d < 0.15
    deletes = c[c["op"] == "D"]
    assert deletes["html"].isna().all()
    assert c[c["op"] != "D"]["html"].notna().all()


def test_changes_late_and_duplicate_injection():
    c = gen_changes(5000)
    ts = c["warc_ts"].to_numpy()
    late = (np.diff(ts.astype("int64")) < 0).mean()
    assert late > 0.01  # out-of-order events exist
    dups = c.duplicated(subset=["url", "warc_ts"], keep=False).sum()
    assert dups > 0  # exact (url, warc_ts) duplicates exist for LSN tiebreak


def test_skew_config_concentrates_events():
    cfg = ChangeGenConfig(n_keys=1000, hot_frac=0.4, n_hot_keys=4)
    c = gen_changes(5000, cfg)
    top = c["url"].value_counts()
    assert top.iloc[:4].sum() > 0.3 * len(c)


def test_malformed_injection():
    cfg = ChangeGenConfig(malformed_frac=0.05)
    c = gen_changes(2000, cfg)
    bad_url = c["url"].isna().sum()
    bad_op = (~c["op"].isin(["I", "U", "D"])).sum()
    bad_ts = c["warc_ts"].isna().sum()
    assert bad_url > 0 and bad_op > 0 and bad_ts > 0
