"""Headline query pack over the driver's parquet tables + synthetic CDC.

Each function takes (spark, sf_dir) and returns a DataFrame.  Every
aggregate / computed column is aliased identically to the companion
DuckDB oracle SQL in __spark_entry__.py (the driver hash-compares
values after sorting columns by name).  Doubles are rounded in BOTH
engines to absorb summation-order FP differences.

Operator coverage demonstrated here (SURVEY.md §2 mapping):
scan+filter+project (pushdown), hash agg, broadcast + shuffle joins,
window/top-k, set ops, string transforms, per-key latest (the CDC
dedup semantic), cosine similarity, dedup family, pandas-UDF chain.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---- TPC-H-ish relational coverage -----------------------------------------

def q1_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-03-15"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-03-15"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        # region/nation are tiny: broadcast them explicitly
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def top_customer_per_nation(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    top = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        top.join(F.broadcast(n), top.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy("n_name")
    )


def purchasers_without_errors(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    erroring = e.filter(F.col("event_type") == "error").select("user_id").distinct()
    return buyers.exceptAll(erroring).orderBy("user_id")


# ---- CDC semantics over the events stream (oracle-checkable) ----------------

def events_latest_per_user(spark, sf_dir):
    """Per-key latest-event collapse — the CDC dedup winner, as SQL.

    Same plan shape as cdc.plan.dedup_winners: one groupBy with
    max_by over the (ts, id) rank struct, map-side combined.
    """
    e = _t(spark, sf_dir, "events")
    payload = F.struct("event_id", "ts", "event_type", "value")
    rank = F.struct("ts", "event_id")
    won = e.groupBy("user_id").agg(F.max_by(payload, rank).alias("w"))
    return won.select(
        "user_id",
        F.col("w.event_id").alias("event_id"),
        F.col("w.ts").alias("ts"),
        F.col("w.event_type").alias("event_type"),
        F.round(F.col("w.value"), 4).alias("value"),
    ).orderBy("user_id")


def events_type_rollup(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


def events_user_daily(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("user_id", "day")
    )


# ---- documents: text-pipeline ops (oracle-checkable subset) -----------------

_NORM = r"regexp_replace(lower(trim(text)), '\\s+', ' ')"


def doc_exact_dedup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        d.groupBy(norm.alias("norm_text"))
        .agg(F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("rep_id", "n_dups")
        .orderBy("rep_id")
    )


def doc_token_count(spark, sf_dir):
    from .operators.textstats import token_count_expr

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", token_count_expr("text").alias("n_tokens")).orderBy(
        "doc_id"
    )


def doc_stats_by_lang(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
            F.round(
                F.avg(F.size(F.filter(F.split("text", r"\s+"), lambda w: w != ""))), 2
            ).alias("avg_words"),
        )
        .orderBy("lang")
    )


# ---- embeddings: similarity search ------------------------------------------

def ann_topk_cosine(spark, sf_dir):
    """Exact cosine top-10 vs the vec_id=0 embedding (brute force)."""
    from .operators.similarity import cosine_col

    emb = _t(spark, sf_dir, "embeddings")
    qvec = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_q"))
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(qvec)
        .select(
            "vec_id",
            F.round(
                cosine_col(
                    F.col("embedding").cast("array<double>"),
                    F.col("_q").cast("array<double>"),
                ),
                4,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(10)


# ---- non-SQL-expressible ops (rows-only driver check) ------------------------

def cdc_replay_synthetic(spark, sf_dir):
    """Flagship: full CDC replay on deterministic synthetic data.

    Seeds a pages table, applies a 3-batch change stream (skewed keys,
    late events, duplicates, malformed rows), returns the final public
    table.  Runs in a temp dir; result depends only on the generator
    seed.  (html column dropped from the result for driver-side
    hashing stability of binary columns.)
    """
    import tempfile

    from .cdc import CdcApplier, ChangeGenConfig, gen_pages, read_pages, replay, seed_pages

    root = tempfile.mkdtemp(prefix="cdc_entry_")
    cfg = ChangeGenConfig(
        n_keys=60, hot_frac=0.25, n_hot_keys=4, late_frac=0.05, dup_frac=0.01,
        malformed_frac=0.02,
    )
    applier = CdcApplier(spark, root, n_buckets=8)
    seed_pages(applier.pages, spark.createDataFrame(gen_pages(60)))
    replay(applier, spark, n_events=600, batch_size=200, cfg=cfg)
    return (
        read_pages(applier.pages)
        .select("url", "warc_ts", "text", "lang")
        .orderBy("url")
    )


def minhash_dedup_documents(spark, sf_dir):
    from .operators.dedup import minhash_lsh_dedup

    d = _t(spark, sf_dir, "documents")
    kept = minhash_lsh_dedup(d, num_hashes=32, bands=16, shingle_n=3, threshold=0.7)
    return kept.select("doc_id", "lang", "source").orderBy("doc_id")


def simhash_documents(spark, sf_dir):
    from .operators.dedup import simhash_expr

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", simhash_expr("text", bits=32).alias("simhash32")).orderBy(
        "doc_id"
    )


def embedding_neardup(spark, sf_dir):
    from .operators.similarity import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.95, n_planes=8, n_tables=4).orderBy(
        "id_a", "id_b"
    )


def lang_tag_documents(spark, sf_dir):
    from .functions.udf import quality_score_udf, tag_lang_udf, token_count_udf

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tag_lang_udf(F.col("text")).alias("lang_tag"),
        token_count_udf(F.col("text")).alias("n_tokens"),
        quality_score_udf(F.col("text")).alias("quality"),
    ).orderBy("doc_id")


def media_features(spark, sf_dir):
    from .operators.multimodal import decode_features, gen_media

    media = gen_media(spark, 200)
    return decode_features(media).orderBy("media_id")


# ---- registry ---------------------------------------------------------------

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "top_customer_per_nation": top_customer_per_nation,
    "purchasers_without_errors": purchasers_without_errors,
    "events_latest_per_user": events_latest_per_user,
    "events_type_rollup": events_type_rollup,
    "events_user_daily": events_user_daily,
    "doc_exact_dedup": doc_exact_dedup,
    "doc_token_count": doc_token_count,
    "doc_stats_by_lang": doc_stats_by_lang,
    "ann_topk_cosine": ann_topk_cosine,
    "cdc_replay_synthetic": cdc_replay_synthetic,
    "minhash_dedup_documents": minhash_dedup_documents,
    "simhash_documents": simhash_documents,
    "embedding_neardup": embedding_neardup,
    "lang_tag_documents": lang_tag_documents,
    "media_features": media_features,
}
