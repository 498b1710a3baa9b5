"""Document deduplication operators (exact + near-dup families).

All operators are DataFrame -> DataFrame, keyed on a configurable id /
text column, and built to scale: the quadratic candidate comparison is
always confined to LSH/band buckets (never a cross join of the corpus).

- exact_dedup:       hash-groupBy on the full text (1 shuffle).
- minhash_lsh_dedup: shingle -> minhash -> band buckets -> in-bucket
                     verify; union-find-free: keep min doc_id per
                     duplicate component edge closure approximation
                     (pairs -> keep lowest id of each connected pair
                     chain via iterative min propagation).
- simhash_dedup:     64-bit simhash, duplicates = identical fingerprint
                     (optionally banded for hamming<=k).
- ngram_jaccard_pairs: exact n-gram Jaccard similarity, but only within
                     LSH candidate buckets.

Built-ins do the heavy lifting (split/transform/aggregate/explode are
all JVM-side); hashing uses xxhash64/hash built-ins — no Python UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _normalized_text(col: str) -> F.Column:
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact normalized-text group."""
    key = F.xxhash64(_normalized_text(text_col)).alias("_h")
    return (
        df.withColumn("_h", key)
        .groupBy("_h")
        .agg(F.min_by(F.struct(*df.columns), F.col(id_col)).alias("w"))
        .select("w.*")
    )


def shingles(col: F.Column, n: int = 5) -> F.Column:
    """Word n-gram shingle array (JVM-side: split + transform + slice)."""
    words = F.split(col, r"\s+")
    cnt = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.when(cnt >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    ).otherwise(F.array(F.concat_ws(" ", words)))


def hashed_word_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(_id, _wh: array<long>) — every word hashed exactly once.

    First stage of the fingerprinted shingle pipeline (see
    ``hashed_shingle_frame``).  Callers persist this frame: the
    windowing expression downstream references ``_wh`` as a BOUND
    attribute of a cached relation, never as an inline subtree — a
    collapsed projection would re-evaluate the whole word-hash array
    inside each ``element_at`` lambda call, turning an O(W) pass into
    O(W^2) per document.
    """
    return df.select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.split(_normalized_text(text_col), r"\s+"), lambda w: F.xxhash64(w)
        ).alias("_wh"),
    )


def window_hash_expr(wh: F.Column, n: int = 5) -> F.Column:
    """Fold each n-window of word hashes into one 64-bit shingle hash.

    The string shingle formulation builds every n-word shingle as a
    fresh string (O(words x n) bytes of concat) and downstream hashes
    those strings 64 times for the minhash permutations.  Fingerprinted
    shingles hash each word once, combine n word hashes per window
    position, and every downstream permutation then hashes 16 fixed
    bytes instead of an ~n-word string.  Set semantics (dedup, Jaccard)
    are preserved up to 64-bit collisions — the standard web-scale
    trade (Broder-style shingle fingerprints).

    ``wh`` MUST be a bound attribute (see ``hashed_word_frame``).
    """
    cnt = F.size(wh)
    idx = F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1)))
    windowed = F.transform(
        idx, lambda i: F.xxhash64(*[F.element_at(wh, i + k) for k in range(n)])
    )
    short = F.array(
        F.aggregate(wh, F.lit(0).cast("long"), lambda acc, h: F.xxhash64(acc, h))
    )
    return F.array_distinct(F.when(cnt >= n, windowed).otherwise(short))


def minhash_signature(shingle_col: F.Column, num_hashes: int = 64) -> F.Column:
    """num_hashes minhash values: min over xxhash64(shingle, seed=i).

    Seeded xxhash64 per permutation — all JVM-side array ops.

    NB: the permutation index must be closure-captured through a
    factory, NOT a lambda default arg — pyspark inspects lambda arity
    and would bind a default arg as an extra unresolved lambda variable.
    """

    def perm(i: int):
        return lambda s: F.xxhash64(s, F.lit(i))

    return F.array(
        *[
            F.array_min(F.transform(shingle_col, perm(i))).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )


_MERSENNE61 = (1 << 61) - 1


def _band_buckets_udf(num_hashes: int, bands: int):
    """Arrow-batched minhash banding: array<long> shingles -> array<long>
    of ``bands`` LSH bucket ids, all ``num_hashes`` permutations in one
    numpy pass per batch.

    Hash family: ``h_i(x) = (a_i * x32 + b_i) mod (2^61 - 1)`` over the
    low 32 bits of the shingle fingerprint (products stay < 2^63, so
    uint64 arithmetic is exact) — the standard universal family for
    minhash.  Band bucket = FNV fold of the band's row minima.  The
    expression engine's seeded-xxhash64 family (``minhash_signature``)
    gives DIFFERENT buckets — any min-wise family is valid, candidates
    are verified by exact Jaccard downstream — but ~10x slower: 32
    interpreted higher-order ``transform`` passes vs one vectorized
    matmul-shaped sweep (no codegen exists for HOF lambdas).

    Docs with no shingles get the constant bucket -1 in every band
    (same collide-then-verify behavior as the expression path, where
    ``array_min`` of an empty array is null).
    """
    rng = np.random.RandomState(0x5EED)
    a = rng.randint(1, 1 << 31, size=num_hashes).astype(np.uint64)
    b = rng.randint(0, _MERSENNE61, size=num_hashes).astype(np.uint64)
    rpb = num_hashes // bands
    p = np.uint64(_MERSENNE61)
    mask32 = np.uint64(0xFFFFFFFF)
    fnv_off = np.uint64(14695981039346656037)
    fnv_prime = np.uint64(1099511628211)

    def bucketize(sh):
        n = len(sh)
        lens = np.fromiter(
            (0 if x is None else len(x) for x in sh), np.int64, count=n
        )
        out = np.full((n, bands), -1, np.int64)
        nz = lens > 0
        if nz.any():
            flat = (
                np.concatenate([np.asarray(x) for x in sh[nz]])
                .astype(np.uint64)
                & mask32
            )
            offs = np.zeros(int(nz.sum()), np.int64)
            np.cumsum(lens[nz][:-1], out=offs[1:])
            # one vectorized pass per permutation keeps peak memory at
            # O(total shingles), not O(num_hashes * total shingles)
            mins = np.empty((num_hashes, offs.size), np.uint64)
            for i in range(num_hashes):
                mins[i] = np.minimum.reduceat((a[i] * flat + b[i]) % p, offs)
            buckets = np.empty((bands, offs.size), np.uint64)
            for band in range(bands):
                acc = np.full(offs.size, fnv_off, np.uint64)
                for r in range(rpb):
                    acc = (acc * fnv_prime) ^ mins[band * rpb + r]
                buckets[band] = acc
            out[nz] = buckets.T.copy().view(np.int64)  # bit-exact reinterpret
        return pd.Series(list(out))

    return pandas_udf(bucketize, "array<long>")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    sh_df: DataFrame | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Candidate duplicate pairs (a < b) via banded minhash LSH.

    Plan shape: project signature -> explode bands (x bands) ->
    shuffle on band hash -> self-join within bucket.  The self-join is
    per-bucket, so cost is sum over buckets of |bucket|^2 — bounded by
    collision rate, not corpus size.

    ``sh_df``: optional precomputed (_id, _sh) shingle frame (string or
    fingerprinted-long shingles — the hashing below is type-generic);
    pass one to share a single shingling pass with the Jaccard
    verifier (see ``minhash_lsh_dedup``).

    ``engine``: ``"arrow"`` (default) computes all band buckets with
    one vectorized numpy sweep per Arrow batch (``_band_buckets_udf``);
    ``"expr"`` keeps the pure-expression seeded-xxhash64 formulation —
    different hash family, same recall guarantees, ~10x slower on wide
    signatures, but zero Python in the plan (useful where the runtime
    forbids Python workers).
    """
    rows_per_band = num_hashes // bands
    if sh_df is not None:
        shingled = sh_df
    else:
        sh = F.array_distinct(shingles(_normalized_text(text_col), shingle_n))
        shingled = df.select(F.col(id_col).alias("_id"), sh.alias("_sh"))

    if engine == "arrow":
        # string shingles are fingerprinted to longs first (one HOF
        # pass) so the Arrow kernel always sees array<long>
        sh_col = F.col("_sh")
        if dict(shingled.dtypes)["_sh"] != "array<bigint>":
            sh_col = F.transform(sh_col, lambda s: F.xxhash64(s))
        bb = _band_buckets_udf(num_hashes, bands)
        banded = shingled.select(
            "_id", F.posexplode(bb(sh_col)).alias("band", "bucket")
        )
    else:
        def perm(i: int):
            return lambda s: F.xxhash64(s, F.lit(i))

        # Band buckets are computed DIRECTLY from each permutation's
        # min — never via an intermediate signature-array column.
        # Catalyst's projection collapse would inline such an array
        # into every element_at reference, cloning the shingle
        # expression tree bands*num_hashes times and sending the
        # optimizer into minutes of single-threaded plan rewriting
        # (measured: 400 s driver-side on a 5 k-doc input).  Here every
        # subtree appears exactly once.
        band_structs = []
        for b in range(bands):
            mins = [
                F.array_min(
                    F.transform(F.col("_sh"), perm(b * rows_per_band + r))
                )
                for r in range(rows_per_band)
            ]
            band_structs.append(
                F.struct(
                    F.lit(b).alias("band"), F.xxhash64(*mins).alias("bucket")
                )
            )
        banded = shingled.select(
            "_id", F.explode(F.array(*band_structs)).alias("bb")
        ).select("_id", "bb.band", "bb.bucket")

    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    threshold: float = 0.8,
    sh_df: DataFrame | None = None,
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity.

    Joins shingle sets onto the (small) candidate pair list — the
    expensive set intersection runs only on survivors of LSH.

    ``sh_df``: optional precomputed (_id, _sh) shingle frame shared
    with the candidate generator (fingerprinted-long shingles give the
    same Jaccard up to 64-bit collisions).
    """
    if sh_df is not None:
        sh = sh_df
    else:
        sh = df.select(
            F.col(id_col).alias("_id"),
            F.array_distinct(
                shingles(_normalized_text(text_col), shingle_n)
            ).alias("_sh"),
        )
    a = sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a")
    b = sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b")
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.withColumn("jaccard", F.when(union > 0, inter / union).otherwise(0.0))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.8,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    check_every: int = 2,
    driver_cc_max_edges: int = 500_000,
    engine: str = "arrow",
) -> DataFrame:
    """Drop near-duplicates: keep the min-id representative per component.

    Default banding (64 hashes / 8 bands of 8 rows) sets the LSH
    candidate threshold at (1/8)^(1/8) ~ 0.77, matched to the 0.8
    verify threshold; mismatched banding floods the Jaccard verifier
    with quadratic false candidates.

    Connected components over verified duplicate pairs.  The edge set
    (VERIFIED near-dup pairs — two longs each, already shrunk by LSH +
    the Jaccard gate, typically orders of magnitude smaller than the
    corpus) is fetched with ONE bounded ``limit(max+1).collect()``; at
    or below ``driver_cc_max_edges`` (default 500k ~ 8 MB) components
    are solved with a driver-side union-find in O(E a(E)) — one job
    instead of O(diameter) join+checkpoint rounds, each of which costs
    a fixed ~0.5-1 s of scheduling regardless of size.  Above the
    bound, the distributed path: iterative min-label propagation (converges in
    O(log n) rounds; each round is one join + one aggregate — never a
    driver-side loop over an unbounded edge list).

    Cluster safety: each round's labels are materialized through a
    checkpoint to truncate lineage (otherwise the plan doubles per
    round).  ``checkpoint_dir=None`` (local/bench) uses
    ``localCheckpoint`` — fast, but pinned to executor storage and lost
    on executor death; pass a reliable-storage path (HDFS/S3) on a real
    cluster to switch to ``checkpoint()``.  Convergence is tested every
    ``check_every`` rounds (one driver action per CHECK, not per
    round): min-propagation is monotone, so labels unchanged across a
    k-round block are a fixed point.

    Shingling runs ONCE: words are hashed to longs (`hashed_word_frame`),
    windows folded to 64-bit shingle fingerprints, and both the LSH
    candidate generator and the Jaccard verifier read the same cached
    frames — the dominant cost of the naive pipeline is shingling the
    corpus twice and minhashing n-word strings 64 times each.
    """
    if checkpoint_dir:
        df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def ckpt(frame: DataFrame) -> DataFrame:
        return frame.checkpoint() if checkpoint_dir else frame.localCheckpoint()

    # whf MUST be persisted even though only sh_df is read downstream:
    # the cache boundary makes _wh a bound attribute, blocking the
    # projection-collapse inlining documented in hashed_word_frame
    # (O(W^2) per doc without it)
    whf = hashed_word_frame(df, text_col, id_col).persist()
    sh_df = whf.select(
        "_id", window_hash_expr(F.col("_wh"), shingle_n).alias("_sh")
    ).persist()
    cand = minhash_lsh_candidates(
        df, text_col, id_col, num_hashes, bands, shingle_n, sh_df=sh_df,
        engine=engine,
    )
    edges = ngram_jaccard_pairs(
        df, cand, text_col, id_col, shingle_n, threshold, sh_df=sh_df
    ).persist()

    # ONE bounded driver action decides the CC path AND fetches the
    # small-case edges: limit(max+1).collect() replaces the old
    # count()-then-toLocalIterator pair (two actions, the iterator
    # paying a round trip per partition — measured ~1-2 s of pure
    # scheduling at sf0.1).  The driver-side ceiling is unchanged:
    # at most max+1 two-long rows (~8 MB) ever land on the driver.
    head = edges.select("id_a", "id_b").limit(driver_cc_max_edges + 1).collect()
    if len(head) <= driver_cc_max_edges:
        try:
            # union-find with min-id roots: identical keep-set to the
            # min-label fixed point below
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for row in head:
                ra, rb = find(row[0]), find(row[1])
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            dropped = [(x,) for x in parent if find(x) != x]
            if not dropped:
                return df
            drop = df.sparkSession.createDataFrame(
                dropped, f"{id_col} {dict(df.dtypes)[id_col]}"
            )
            return df.join(drop, id_col, "left_anti")
        finally:
            edges.unpersist()
            sh_df.unpersist()
            whf.unpersist()

    # undirected edges as both directions
    fwd = edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    rev = edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    adj = fwd.unionByName(rev).persist()

    labels = ckpt(
        adj.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    try:
        rounds = 0
        while rounds < max_iter:
            block_start = labels
            for _ in range(min(check_every, max_iter - rounds)):
                neighbor_min = (
                    adj.join(labels, adj.src == labels.node)
                    .groupBy("dst")
                    .agg(F.min("label").alias("nmin"))
                )
                labels = ckpt(
                    labels.join(
                        neighbor_min, labels.node == neighbor_min.dst, "left"
                    ).select(
                        "node",
                        F.least(
                            F.col("label"), F.coalesce("nmin", F.col("label"))
                        ).alias("label"),
                    )
                )
                rounds += 1
            changed = (
                labels.alias("n")
                .join(block_start.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            if changed == 0:
                break

        drop = labels.filter(F.col("node") != F.col("label")).select(
            F.col("node").alias(id_col)
        )
        # drop descends only from the checkpointed labels, so the
        # caches released below are never re-derived by the lazy result
        return df.join(drop, id_col, "left_anti")
    finally:
        adj.unpersist()
        edges.unpersist()
        sh_df.unpersist()
        whf.unpersist()


def simhash_expr(text_col: str, bits: int = 64, shingle_n: int = 3) -> F.Column:
    """64-bit SimHash over word shingles, fully JVM-side, single pass.

    Semantics: bit b is set iff sum over distinct shingles of
    sign(bit b of xxhash64(shingle)) is positive.

    Shape: each shingle is hashed ONCE, then one aggregate() folds the
    hash array into a ``bits``-wide vote vector (zip_with increments
    every bit's counter from the same hash), and the vote vector is
    folded to the bigint signature by Horner's rule in two 32-bit
    halves — shiftleft by a constant, so no ANSI long-overflow on bit
    63.  The naive formulation (one aggregate() pass per bit) costs
    bits x n_shingles hashes and a 64x wider expression tree; this is
    one hash per shingle and one pass.
    """
    sh = F.array_distinct(shingles(_normalized_text(text_col), shingle_n))
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    positions = F.sequence(F.lit(0), F.lit(bits - 1))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                positions,
                lambda b: F.when(F.getbit(h, b) == 1, 1).otherwise(-1),
            ),
            lambda a, v: a + v,
        ),
    )
    half = bits // 2

    def horner(bit_slice: F.Column) -> F.Column:
        # MSB-first fold; each half stays within 32 bits, so the
        # running value never overflows a long
        return F.aggregate(
            F.reverse(bit_slice),
            F.lit(0).cast("long"),
            lambda acc, v: acc * 2 + F.when(v > 0, 1).otherwise(0),
        )

    lo = horner(F.slice(votes, 1, half))
    hi = horner(F.slice(votes, half + 1, bits - half))
    return F.shiftleft(hi, half).bitwiseOR(lo)


def simhash_md5_expr(text_col: str, bits: int = 32, shingle_n: int = 3) -> F.Column:
    """SimHash over an ENGINE-PORTABLE shingle hash (md5 prefix).

    Same algorithm as ``simhash_expr`` but the per-shingle hash is the
    first 8 hex chars of md5(shingle) instead of xxhash64: md5 is
    bit-identical across Spark, DuckDB, and any ANSI engine, so an
    external oracle can recompute the signature exactly (list lambdas +
    hex arithmetic) — this is the hash-checkable variant the driver's
    correctness gate runs.  xxhash64 stays the production default
    (one JVM intrinsic vs md5's full digest per shingle).

    Single-pass shape as simhash_expr: one md5 per distinct shingle,
    one aggregate() folding per-shingle ±1 votes into a ``bits``-wide
    vector, one zip_with folding votes into the signature — every
    subtree appears once (projection-collapse safe).
    """
    assert bits <= 32, "md5 prefix parse uses 8 hex chars (32 bits)"
    sh = F.array_distinct(shingles(_normalized_text(text_col), shingle_n))
    # conv() parses the 8-hex-char prefix as an unsigned 32-bit value;
    # fits a long with room to spare
    vals = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10).cast("long")
    )
    votes = F.aggregate(
        vals,
        F.array_repeat(F.lit(0), bits),
        lambda acc, v: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(v, b).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(-1)
                    for b in range(bits)
                ]
            ),
            lambda a, x: a + x,
        ),
    )
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    terms = F.zip_with(
        votes, powers, lambda vt, p: F.when(vt > 0, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x)


def simhash_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """Keep min-id representative per identical simhash fingerprint."""
    return (
        df.withColumn("_sim", simhash_expr(text_col, bits))
        .groupBy("_sim")
        .agg(F.min_by(F.struct(*df.columns), F.col(id_col)).alias("w"))
        .select("w.*")
    )
