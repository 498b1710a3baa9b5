"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship CDC replay on synthetic sf0.001-scale data.
queries()      -> implemented operators from SURVEY.md §2 + training-
                  data ops, each (spark, sf_dir) -> DataFrame.
oracle_sql()   -> DuckDB-runnable ANSI SQL for every SQL-expressible
                  query, with identical output column names/rounding.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from giraffe_etl_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic CDC replay -> final pages snapshot."""
    from giraffe_etl_spark.session import _ship_package

    _ship_package(spark)
    from giraffe_etl_spark.queries import cdc_replay_synthetic

    return cdc_replay_synthetic(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from giraffe_etl_spark.session import _ship_package

            _ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)                                    AS sum_qty,
                   round(sum(l_extendedprice), 2)                               AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 4)                                    AS avg_qty,
                   round(avg(l_extendedprice), 4)                               AS avg_price,
                   round(avg(l_discount), 4)                                    AS avg_disc,
                   count(*)                                                     AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1997-03-15'
              AND l_shipdate  > TIMESTAMP '1997-03-15'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
        """,
        "top_customer_per_nation": """
            SELECT n_name, c_custkey, round(c_acctbal, 2) AS acctbal
            FROM (
              SELECT *, row_number() OVER (
                         PARTITION BY c_nationkey
                         ORDER BY c_acctbal DESC, c_custkey) AS rn
              FROM customer
            ) t
            JOIN nation ON c_nationkey = n_nationkey
            WHERE rn = 1
            ORDER BY n_name
        """,
        "purchasers_without_errors": """
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
            EXCEPT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
            ORDER BY user_id
        """,
        "events_latest_per_user": """
            SELECT user_id, event_id, ts, event_type, round(value, 4) AS value
            FROM (
              SELECT *, row_number() OVER (
                         PARTITION BY user_id
                         ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) t
            WHERE rn = 1
            ORDER BY user_id
        """,
        "events_type_rollup": """
            SELECT event_type,
                   count(*)                    AS n_events,
                   round(avg(value), 4)        AS avg_value,
                   count(DISTINCT user_id)     AS n_users
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        "events_user_daily": """
            SELECT user_id, date_trunc('day', ts) AS day,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY user_id, date_trunc('day', ts)
            ORDER BY user_id, day
        """,
        "doc_exact_dedup": """
            SELECT min(doc_id) AS rep_id, count(*) AS n_dups
            FROM documents
            GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
            ORDER BY rep_id
        """,
        "doc_token_count": """
            SELECT doc_id,
                   CAST(len(list_filter(
                       regexp_split_to_array(
                           regexp_replace(text, '([^\\w\\s])', ' \\1 ', 'g'),
                           '\\s+'),
                       x -> x <> '')) AS INTEGER) AS n_tokens
            FROM documents
            ORDER BY doc_id
        """,
        "doc_stats_by_lang": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(length(text)), 2) AS avg_chars,
                   round(avg(len(list_filter(
                       regexp_split_to_array(text, '\\s+'), x -> x <> ''))), 2)
                       AS avg_words
            FROM documents
            GROUP BY lang
            ORDER BY lang
        """,
        "ann_topk_cosine": """
            SELECT vec_id,
                   round(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                        WHERE vec_id = 0)), 4) AS cosine
            FROM embeddings
            WHERE vec_id <> 0
            ORDER BY cosine DESC, vec_id
            LIMIT 10
        """,
        # cdc_replay_synthetic, minhash_dedup_documents, simhash_documents,
        # embedding_neardup, lang_tag_documents, media_features: custom
        # engine semantics (lake MERGE / xxhash64 LSH / pandas UDF chain)
        # not expressible in DuckDB SQL -> rows-only check by design.
    }
