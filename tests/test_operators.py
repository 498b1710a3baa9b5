"""Training-data pipeline operators: dedup, similarity, textstats, media."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from giraffe_etl_spark.operators import (
    brute_force_topk,
    char_stats,
    embedding_neardup_pairs,
    exact_dedup,
    lsh_topk,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
    simhash_expr,
    token_count_expr,
    with_fingerprint,
    with_lang,
    with_quality,
    with_token_count,
)
from giraffe_etl_spark.operators.multimodal import decode_features, gen_media


BASE = (
    "the quick brown fox jumps over the lazy dog while the sun shines "
    "bright over the green hills and the river flows gently to the sea "
    "under a calm blue sky full of drifting white clouds all afternoon"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE, "a"),
        (1, BASE, "b"),                                 # exact dup of 0
        (2, BASE.replace("quick", "swift"), "c"),       # near dup of 0
        (3, BASE.replace("dog", "cat").replace("sea", "bay"), "d"),  # near dup
        (4, "completely different text about spark query engines and "
            "distributed columnar execution with whole stage codegen "
            "and adaptive runtime replanning across shuffle boundaries", "e"),
        (5, "der schnelle braune fuchs springt über den faulen hund und "
            "die sonne scheint hell über den grünen hügeln im sommer", "f"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).orderBy("doc_id").collect()
    ids = [r.doc_id for r in out]
    assert 0 in ids and 1 not in ids  # min-id representative kept
    assert len(ids) == 5


def test_minhash_candidates_find_near_dups(spark, docs):
    cand = minhash_lsh_candidates(docs, num_hashes=32, bands=16, shingle_n=3)
    pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    assert (0, 1) in pairs        # exact dup always collides
    assert (0, 2) in pairs or (0, 3) in pairs  # near dups collide
    assert (0, 4) not in pairs and (0, 5) not in pairs


def test_ngram_jaccard_verification(spark, docs):
    cand = minhash_lsh_candidates(docs, num_hashes=32, bands=16, shingle_n=3)
    verified = ngram_jaccard_pairs(docs, cand, shingle_n=3, threshold=0.5)
    rows = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    assert rows.get((0, 1)) == 1.0
    for (a, b), j in rows.items():
        assert 0.5 <= j <= 1.0


def test_minhash_lsh_dedup_removes_cluster(spark, docs):
    kept = minhash_lsh_dedup(docs, num_hashes=32, bands=16, shingle_n=3, threshold=0.5)
    ids = sorted(r.doc_id for r in kept.collect())
    assert 0 in ids          # representative of the dup cluster
    assert 1 not in ids      # exact dup dropped
    assert 4 in ids and 5 in ids  # distinct docs kept


def test_minhash_engines_agree(spark, docs):
    """The Arrow numpy banding and the pure-expression seeded-xxhash64
    banding are different hash families but must converge to the same
    final keep-set: candidates are always verified by exact Jaccard, so
    the engines may only differ in (harmless) false candidates."""
    kw = dict(num_hashes=32, bands=16, shingle_n=3, threshold=0.5)
    via_arrow = sorted(
        r.doc_id for r in minhash_lsh_dedup(docs, engine="arrow", **kw).collect()
    )
    via_expr = sorted(
        r.doc_id for r in minhash_lsh_dedup(docs, engine="expr", **kw).collect()
    )
    assert via_arrow == via_expr
    assert 1 not in via_arrow  # the planted dup is actually dropped


def test_minhash_dedup_cc_paths_agree(spark, docs):
    """The driver union-find (small edge sets) and the distributed
    min-label loop (driver_cc_max_edges=0 forces it) must produce the
    same keep-set — including on a duplicate CHAIN (A~B~C, diameter 2)
    where single-hop propagation would under-merge."""
    rows = [
        (i, f"unique{i}a document{i} about topic{i} mentioning w{i}x w{i}y w{i}z")
        for i in range(20)
    ]
    # chain: adjacent Jaccard 0.636, ends 0.385 — at threshold 0.5 the
    # component {100,101,102} exists ONLY transitively (diameter 2)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    w = base.split()
    rows += [
        (100, " ".join(w)),
        (101, " ".join(w[2:] + ["mu", "nu"])),
        (102, " ".join(w[4:] + ["mu", "nu", "xi", "om"])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(num_hashes=32, bands=16, shingle_n=2, threshold=0.5)
    via_driver = sorted(
        r.doc_id for r in minhash_lsh_dedup(df, **kw).collect()
    )
    via_loop = sorted(
        r.doc_id
        for r in minhash_lsh_dedup(df, driver_cc_max_edges=0, **kw).collect()
    )
    assert via_driver == via_loop
    assert 100 in via_driver and 101 not in via_driver and 102 not in via_driver


def test_minhash_dedup_cluster_checkpoint_dir(spark, docs, tmp_path):
    """checkpoint_dir switches localCheckpoint -> reliable checkpoint()
    (executor-death-safe on a cluster) with identical results; the
    blocked convergence check (check_every) changes nothing either.
    driver_cc_max_edges=0 pins the distributed CC loop — the only path
    that checkpoints."""
    import os

    ckdir = str(tmp_path / "ck")
    default = sorted(
        r.doc_id
        for r in minhash_lsh_dedup(
            docs, num_hashes=32, bands=16, shingle_n=3, threshold=0.5
        ).collect()
    )
    with_ck = sorted(
        r.doc_id
        for r in minhash_lsh_dedup(
            docs, num_hashes=32, bands=16, shingle_n=3, threshold=0.5,
            checkpoint_dir=ckdir, check_every=3, driver_cc_max_edges=0,
        ).collect()
    )
    assert with_ck == default
    assert os.path.isdir(ckdir) and os.listdir(ckdir)  # really used


def test_simhash_dedup_exact_dups(spark, docs):
    out = simhash_dedup(docs, bits=32)
    ids = sorted(r.doc_id for r in out.collect())
    assert 1 not in ids and 0 in ids
    # simhash of identical text identical; distinct texts differ
    sims = docs.select("doc_id", simhash_expr("text", bits=32).alias("s")).collect()
    by_id = {r.doc_id: r.s for r in sims}
    assert by_id[0] == by_id[1]
    assert by_id[0] != by_id[4]


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(40, 16).astype("float32")
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist(), int(i % 4)) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int"), base


def test_brute_force_topk_matches_numpy(spark, vectors):
    corpus, base = vectors
    queries = spark.createDataFrame(
        [(100, base[0].tolist()), (101, base[7].tolist())],
        "query_id long, embedding array<float>",
    )
    got = brute_force_topk(corpus, queries, k=5)
    got_map = {}
    for r in got.collect():
        got_map.setdefault(r.query_id, []).append((r.vec_id, r.cosine))
    sims = base @ base[[0, 7]].T
    for qi, qid in enumerate([100, 101]):
        order = np.argsort(-sims[:, qi])[:5]
        got_ids = [v for v, _ in sorted(got_map[qid], key=lambda t: -t[1])]
        assert got_ids[0] == order[0]  # top-1 exact
        assert set(got_ids) == set(order.tolist())


def test_lsh_topk_recall(spark, vectors):
    corpus, base = vectors
    queries = spark.createDataFrame(
        [(100, base[3].tolist())], "query_id long, embedding array<float>"
    )
    exact = {r.vec_id for r in brute_force_topk(corpus, queries, k=5).collect()}
    approx = {r.vec_id for r in lsh_topk(corpus, queries, k=5, n_planes=4, n_tables=8).collect()}
    assert base is not None
    assert len(exact & approx) >= 3  # decent recall on tiny corpus
    assert 3 in approx  # the query vector itself always found


def test_embedding_neardup(spark, vectors):
    corpus, base = vectors
    # add a near-duplicate of vector 0
    dup = (999, (base[0] + 1e-3).tolist(), 0)
    corpus2 = corpus.union(
        corpus.sparkSession.createDataFrame([dup], corpus.schema)
    )
    pairs = embedding_neardup_pairs(corpus2, threshold=0.999, n_planes=6, n_tables=4)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 999) in found


def test_textstats(spark, docs):
    out = (
        with_fingerprint(with_token_count(with_quality(with_lang(docs))))
        .orderBy("doc_id")
        .collect()
    )
    assert out[0].lang_tag == "en"
    assert out[5].lang_tag == "de"
    assert all(0 <= r.quality <= 1 for r in out)
    assert out[0].n_tokens == out[1].n_tokens
    assert out[0].fp64 == out[1].fp64 and out[0].fp64 != out[4].fp64

    # JVM-side token count agrees with the pure-Python UDF count
    jvm = docs.select("doc_id", token_count_expr("text").alias("n")).orderBy("doc_id").collect()
    for r_jvm, r_udf in zip(jvm, out):
        assert r_jvm.n == r_udf.n_tokens

    cs = char_stats(docs).orderBy("doc_id").collect()
    assert cs[0].n_words > 0 and 0 < cs[0].alpha_ratio <= 1


def test_multimodal_plumbing(spark):
    media = gen_media(spark, 30)
    feats = decode_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert r.n_bytes > 0 and r.checksum is not None
        assert r.width is not None and 16 <= r.width < 80
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-6
    # determinism: same payload -> same feature
    again = decode_features(media).collect()
    assert [r.feature for r in again] == [r.feature for r in feats]


# ---- real PNG codec (stdlib) ------------------------------------------------


def test_png_roundtrip_pure():
    from giraffe_etl_spark.operators.multimodal import png_decode, png_encode

    w, h = 7, 5
    pixels = bytes((3 + i) % 256 for i in range(w * h))
    payload = png_encode(w, h, pixels)
    assert payload.startswith(b"\x89PNG\r\n\x1a\n")
    dec = png_decode(payload)
    assert (dec["width"], dec["height"]) == (w, h)
    # histogram over DECODED pixel bytes, normalized
    want = [0] * 8
    for b in pixels:
        want[b % 8] += 1
    got = [round(v * w * h) for v in dec["feature"]]
    assert got == want


def test_png_decode_rejects_non_png_and_variants():
    import struct
    import zlib

    import pytest as _pytest

    from giraffe_etl_spark.operators.multimodal import png_decode, png_encode

    with _pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"GIF89a....")
    # corrupt the IHDR color type -> unsupported variant
    good = bytearray(png_encode(2, 2, bytes(4)))
    sig, ln = 8, 4
    # IHDR body starts at sig + len + tag
    ihdr_body = sig + 4 + 4
    good[ihdr_body + 9] = 2  # color_type RGB
    with _pytest.raises(ValueError, match="unsupported"):
        png_decode(bytes(good))
    # truncated IDAT -> zlib error surfaces as decode failure
    with _pytest.raises(Exception):
        png_decode(png_encode(2, 2, bytes(4))[:-20] + struct.pack(">I", 0))


def test_image_decoder_dispatches_png_vs_fake():
    from giraffe_etl_spark.operators.multimodal import (
        _DECODERS,
        png_encode,
    )

    img = _DECODERS["image"]
    real = img(png_encode(3, 2, bytes(range(6))))
    assert (real["width"], real["height"]) == (3, 2)
    fake = img(b"\x20" + b"\x00" * 30 + b"\x30")  # not a PNG
    assert fake["width"] == 16 + 0x20 % 64 and fake["height"] == 16 + 0x30 % 64
