"""Deterministic synthetic data generators (pages + change stream).

Shapes per FIXTURES.md:
  pages  (url string, warc_ts timestamp, html binary, text string, lang string)
  changes(lsn long, op string, url string, warc_ts timestamp, html binary)

Every row is a pure function of ``(seed, row_index)`` through a
counter-based PRNG (splitmix64).  Consequences:

- generation is vectorized (numpy) and needs no state,
- the distributed generator (``changes_df`` via spark.range +
  mapInPandas) produces byte-identical rows under ANY partitioning or
  parallelism — the invariance tests lean on this,
- small-scale pandas and large-scale Spark outputs agree exactly.

No external data; no wall clock (base epoch fixed at 2024-01-01).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..functions.text import extract_text, tag_lang

BASE_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    z = (x + _GOLDEN).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _rand(seed: int, idx: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic uint64 for each (seed, stream, index) triple."""
    base = np.uint64((seed * 1_000_003 + stream * 7919) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        return _splitmix64(idx.astype(np.uint64) * np.uint64(2654435761) + base)


@dataclass(frozen=True)
class ChangeGenConfig:
    """Knobs for the change stream (defaults mirror FIXTURES.md §2)."""

    seed: int = 42
    n_keys: int = 1000          # size of the url key space shared with pages
    new_key_frac: float = 0.10  # events hitting urls absent from pages
    hot_frac: float = 0.0       # skew: fraction of events on the hot key set
    n_hot_keys: int = 8         # size of the hot key set
    late_frac: float = 0.05     # out-of-order (late) warc_ts
    dup_frac: float = 0.01      # exact-duplicate (url, warc_ts) pairs
    malformed_frac: float = 0.0 # quarantine-able rows (error-routing tests)
    html_size: int = 256        # approximate html payload size in bytes
    ts_step_us: int = 1_000_000 # event-time spacing


# --- url/key helpers --------------------------------------------------------

def _key_to_url(k: np.ndarray, n_hosts: int) -> list[str]:
    host = k % n_hosts
    return [f"http://host{h}.example.org/page/{kk}" for h, kk in zip(host, k)]


def _pick_keys(cfg: ChangeGenConfig, idx: np.ndarray) -> np.ndarray:
    r = _rand(cfg.seed, idx, 2)
    total_keys = int(cfg.n_keys * (1.0 + cfg.new_key_frac))
    k = (r % np.uint64(max(total_keys, 1))).astype(np.int64)
    if cfg.hot_frac > 0:
        r_hot = _rand(cfg.seed, idx, 3)
        hot_mask = (r_hot % np.uint64(10_000)) < np.uint64(int(cfg.hot_frac * 10_000))
        r_which = _rand(cfg.seed, idx, 4)
        k = np.where(hot_mask, (r_which % np.uint64(cfg.n_hot_keys)).astype(np.int64), k)
    return k


def _html_bytes(url: str, lsn: int, size: int, flavor: int) -> bytes:
    """Seeded pseudo-HTML: ascii + utf-8 multibyte + a few invalid bytes."""
    # deterministic multilingual filler keyed by flavor
    fillers = [
        b"the quick brown fox jumps over the lazy dog and runs far away ",
        b"der schnelle braune fuchs springt \xc3\xbcber den faulen hund ",
        b"le renard brun rapide saute par dessus le chien paresseux ",
        b"el zorro marr\xc3\xb3n r\xc3\xa1pido salta sobre el perro perezoso ",
        b"a gyors barna r\xc3\xb3ka \xc3\xa1tugorja a lusta kuty\xc3\xa1t \xc3\xa9s elszalad ",
    ]
    body = fillers[flavor % len(fillers)]
    head = (
        b"<html><head><title>doc " + str(lsn).encode() + b"</title>"
        b"<script>var x = 1 < 2;</script><style>p{color:red}</style></head><body>"
    )
    parts = [head, b"<h1>", url.encode(), b"</h1>"]
    n = max(1, (size - len(head)) // (len(body) + 7))
    for i in range(n):
        parts.append(b"<p>" + body + b"</p>")
    parts.append(b"<p>rev " + str(lsn).encode() + b" &amp; counting</p>")
    if flavor % 7 == 0:
        # raw invalid-UTF8 bytes inside the body: proves byte fidelity of
        # the binary column and determinism of replacement decoding
        parts.append(b"<p>\xff\xfe\x80 raw</p>")
    parts.append(b"<!-- comment \xf0\x9f\x98\x80 --></body></html>")
    return b"".join(parts)


# --- pages (initial target table) -------------------------------------------

def gen_page_batch(
    start: int, count: int, n_total: int, seed: int = 42, html_size: int = 256
) -> pd.DataFrame:
    """Rows [start, start+count) of the pages table keyed 0..n_total-1.

    Pure in (start, count, n_total, seed): any tiling reproduces the
    same rows.  warc_ts sits ~1 day before the change stream's base so
    stream events normally win last-writer-wins.
    """
    idx = np.arange(start, start + count, dtype=np.uint64)
    n_hosts = max(n_total // 3, 1)
    urls = _key_to_url(idx.astype(np.int64), n_hosts)
    r = _rand(seed, idx, 10)
    ts_us = BASE_EPOCH_US - 86_400_000_000 + (r % np.uint64(3_600_000_000)).astype(np.int64)
    flavors = (_rand(seed, idx, 11) % np.uint64(97)).astype(np.int64)
    html = [
        _html_bytes(u, int(-1 - i), html_size, int(f))
        for i, u, f in zip(idx.astype(np.int64), urls, flavors)
    ]
    text = [extract_text(h) for h in html]
    lang = [tag_lang(t) for t in text]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.to_datetime(ts_us, unit="us"),
            "html": html,
            "text": text,
            "lang": lang,
        }
    )


def gen_pages(n: int, seed: int = 42, html_size: int = 256) -> pd.DataFrame:
    """Whole pages table in pandas (small n: tests / oracle)."""
    return gen_page_batch(0, n, n, seed, html_size)


# --- change stream -----------------------------------------------------------

_OP_CODES = np.array(["I", "U", "D"])


def gen_change_batch(cfg: ChangeGenConfig, start: int, count: int) -> pd.DataFrame:
    """Rows [start, start+count) of the infinite deterministic stream.

    Pure in (cfg, start, count): any tiling of [0, N) into batches
    yields the same multiset of rows.
    """
    idx = np.arange(start, start + count, dtype=np.uint64)
    n_hosts = max(cfg.n_keys // 3, 1)

    # lsn: strictly monotonic with gaps — lsn_i in [3i, 3i+2]
    r_gap = _rand(cfg.seed, idx, 0)
    lsn = (idx.astype(np.int64) * 3) + (r_gap % np.uint64(3)).astype(np.int64)

    r_op = _rand(cfg.seed, idx, 1) % np.uint64(100)
    op = np.where(r_op < 50, "I", np.where(r_op < 90, "U", "D"))

    keys = _pick_keys(cfg, idx)
    urls = np.array(_key_to_url(keys, n_hosts), dtype=object)

    # warc_ts mostly increasing; late_frac pushed back 1..2000s
    ts_us = BASE_EPOCH_US + idx.astype(np.int64) * cfg.ts_step_us
    r_late = _rand(cfg.seed, idx, 5)
    late = (r_late % np.uint64(10_000)) < np.uint64(int(cfg.late_frac * 10_000))
    back = (np.uint64(1) + _rand(cfg.seed, idx, 6) % np.uint64(2_000)).astype(np.int64)
    ts_us = np.where(late, ts_us - back * 1_000_000, ts_us)

    # exact-duplicate (url, warc_ts) pairs: row copies url+ts of row i-1
    r_dup = _rand(cfg.seed, idx, 7)
    dup = ((r_dup % np.uint64(10_000)) < np.uint64(int(cfg.dup_frac * 10_000))) & (idx > 0)
    if dup.any():
        pidx = idx - np.uint64(1)
        p_keys = _pick_keys(cfg, pidx)
        p_urls = np.array(_key_to_url(p_keys, n_hosts), dtype=object)
        p_ts = BASE_EPOCH_US + pidx.astype(np.int64) * cfg.ts_step_us
        p_late = (_rand(cfg.seed, pidx, 5) % np.uint64(10_000)) < np.uint64(
            int(cfg.late_frac * 10_000)
        )
        p_back = (np.uint64(1) + _rand(cfg.seed, pidx, 6) % np.uint64(2_000)).astype(np.int64)
        p_ts = np.where(p_late, p_ts - p_back * 1_000_000, p_ts)
        urls = np.where(dup, p_urls, urls)
        ts_us = np.where(dup, p_ts, ts_us)

    flavors = (_rand(cfg.seed, idx, 8) % np.uint64(97)).astype(np.int64)
    html: list[bytes | None] = [
        None if o == "D" else _html_bytes(u, int(l), cfg.html_size, int(f))
        for o, u, l, f in zip(op, urls, lsn, flavors)
    ]

    out = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "url": urls.astype(str),
            "warc_ts": pd.to_datetime(ts_us, unit="us"),
            "html": html,
        }
    )

    if cfg.malformed_frac > 0:
        r_bad = _rand(cfg.seed, idx, 9)
        bad = (r_bad % np.uint64(10_000)) < np.uint64(int(cfg.malformed_frac * 10_000))
        kind = (_rand(cfg.seed, idx, 12) % np.uint64(4)).astype(np.int64)
        url_col = out["url"].to_numpy(dtype=object)
        op_col = out["op"].to_numpy(dtype=object)
        ts_col = out["warc_ts"].to_numpy(dtype=object)
        html_col = out["html"].to_numpy(dtype=object)
        for i in np.nonzero(bad)[0]:
            k = int(kind[i])
            if k == 0:
                url_col[i] = None
            elif k == 1:
                op_col[i] = "X"
            elif k == 2:
                ts_col[i] = pd.NaT
            else:
                if op_col[i] != "D":
                    html_col[i] = None
                else:
                    op_col[i] = "?"
        out["url"] = url_col
        out["op"] = op_col
        out["warc_ts"] = ts_col
        out["html"] = html_col
    return out


def gen_changes(n: int, cfg: ChangeGenConfig | None = None) -> pd.DataFrame:
    """Pandas convenience wrapper for small n (tests / oracle)."""
    return gen_change_batch(cfg or ChangeGenConfig(), 0, n)


# --- distributed generation ---------------------------------------------------

_CHANGES_SCHEMA = "lsn long, op string, url string, warc_ts timestamp, html binary"
_PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def changes_df(spark, n: int, cfg: ChangeGenConfig | None = None, partitions: int | None = None):
    """Distributed change stream: spark.range -> mapInPandas.

    Each task generates its own index range; because rows are pure in
    (seed, index) the result is partitioning-invariant.  Scales to any
    n without driver memory pressure.
    """
    cfg = cfg or ChangeGenConfig()
    num_parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            # ids from spark.range are contiguous per partition
            yield gen_change_batch(cfg, int(ids.min()), len(ids))

    return (
        spark.range(0, n, 1, num_parts)
        .mapInPandas(gen, schema=_CHANGES_SCHEMA)
    )


def pages_df(spark, n: int, seed: int = 42, html_size: int = 256, partitions: int | None = None):
    """Distributed initial pages table (same purity argument)."""
    num_parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            yield gen_page_batch(int(ids.min()), len(ids), n, seed, html_size)

    return spark.range(0, n, 1, num_parts).mapInPandas(gen, schema=_PAGES_SCHEMA)
