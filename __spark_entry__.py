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


def _lang_vote_sql() -> str:
    """DuckDB re-implementation of the tag_lang stopword vote.

    Generated from the SAME stopword tables the UDF uses, so engine and
    oracle cannot drift.  Tie-break matches tag_lang: highest score,
    then lang-code sort order (list_sort over (-score, lang) structs).
    """
    from giraffe_etl_spark.functions.text import _LANG_STOPWORDS, _LANGS

    scores, structs = [], []
    for lang in _LANGS:
        sw = ", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS[lang]))
        scores.append(
            f"len(list_filter(words, w -> list_contains([{sw}], w))) AS s_{lang}"
        )
        structs.append(f"{{'neg': -s_{lang}, 'lang': '{lang}'}}")
    greatest = ", ".join(f"s_{lang}" for lang in _LANGS)
    return f"""
        WITH toks AS (
            SELECT n_chars, regexp_extract_all(lower(text), '[a-z]+') AS words
            FROM documents),
        scores AS (
            SELECT n_chars, {", ".join(scores)} FROM toks),
        tagged AS (
            SELECT n_chars,
                   CASE WHEN greatest({greatest}) <= 0 THEN 'und'
                        ELSE list_sort([{", ".join(structs)}])[1].lang
                   END AS lang_tag
            FROM scores)
        SELECT lang_tag, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM tagged GROUP BY lang_tag ORDER BY lang_tag
    """


def _lang_tag_docs_sql() -> str:
    """Per-document DuckDB oracle for (lang_tag, n_tokens, quality).

    Generated from the same stopword tables and score formulas the UDFs
    wrap (functions/text.py: tag_lang, token_count, quality_score), so
    engine and oracle cannot drift.  Document text is printable ASCII
    (verified over the test tables), so Python's unicode-aware \\w /
    isalpha and DuckDB's ASCII classes agree.
    """
    from giraffe_etl_spark.functions.text import _LANG_STOPWORDS, _LANGS

    scores, structs = [], []
    for lang in _LANGS:
        sw = ", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS[lang]))
        scores.append(
            f"len(list_filter(lwords, w -> list_contains([{sw}], w))) AS s_{lang}"
        )
        structs.append(f"{{'neg': -s_{lang}, 'lang': '{lang}'}}")
    greatest = ", ".join(f"s_{lang}" for lang in _LANGS)
    en_sw = ", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS["en"]))
    return f"""
        WITH t AS (
            SELECT doc_id, text,
                   regexp_extract_all(lower(text), '[a-z]+') AS lwords,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS words
            FROM documents),
        s AS (
            SELECT doc_id, text, words, {", ".join(scores)} FROM t),
        q AS (
            SELECT doc_id,
                   CASE WHEN greatest({greatest}) <= 0 THEN 'und'
                        ELSE list_sort([{", ".join(structs)}])[1].lang
                   END AS lang_tag,
                   CAST(len(list_filter(
                       regexp_split_to_array(
                           regexp_replace(text, '([^\\w\\s])', ' \\1 ', 'g'),
                           '\\s+'),
                       x -> x <> '')) AS INTEGER) AS n_tokens,
                   length(text) AS n,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                   CASE WHEN len(words) > 0
                        THEN list_aggregate(
                                 list_transform(words, w -> length(w)), 'sum')
                             / CAST(len(words) AS DOUBLE)
                        ELSE 0.0 END AS mean_wlen,
                   CASE WHEN len(words) > 0
                        THEN len(list_filter(
                                 words, w -> list_contains([{en_sw}], lower(w))))
                             / CAST(len(words) AS DOUBLE)
                        ELSE 0.0 END AS sw_ratio
            FROM s)
        SELECT doc_id, lang_tag, n_tokens,
               CASE WHEN n = 0 THEN 0.0 ELSE round((
                   (CASE WHEN n BETWEEN 200 AND 100000 THEN 1.0
                         WHEN n < 200 THEN n / 200.0 ELSE 0.5 END)
                 + least(1.0, (n_alpha / CAST(n AS DOUBLE)) / 0.7)
                 + (CASE WHEN mean_wlen BETWEEN 3.0 AND 12.0
                         THEN 1.0 ELSE 0.3 END)
                 + least(1.0, sw_ratio / 0.1)
               ) / 4.0, 6) END AS quality
        FROM q ORDER BY doc_id
    """


def _simhash_md5_sql(bits: int = 32, shingle_n: int = 3) -> str:
    """DuckDB re-implementation of simhash_md5_expr (operators/dedup.py).

    Same algorithm, same hash: distinct 3-word shingles over
    whitespace-normalized text, per-shingle 32-bit value from the md5
    hex prefix (md5 is bit-identical across engines), +-1 votes per bit,
    sign fold to the signature.
    """
    n = shingle_n
    return f"""
        WITH t AS (
          SELECT doc_id,
                 regexp_split_to_array(
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                     ' ') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
                 list_distinct(CASE WHEN len(w) >= {n}
                    THEN list_transform(range(1, len(w) - {n - 2}),
                                        i -> array_to_string(w[i:i+{n - 1}], ' '))
                    ELSE [array_to_string(w, ' ')] END) AS s
          FROM t),
        v AS (
          SELECT doc_id,
                 list_transform(
                     s, x -> CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT)
                 ) AS vals
          FROM sh),
        votes AS (
          SELECT doc_id,
                 list_transform(range(0, {bits}), b -> list_sum(
                     list_transform(vals, vv ->
                         CASE WHEN (vv // (1::BIGINT << b)) % 2 = 1
                              THEN 1 ELSE -1 END))) AS vt
          FROM v)
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, {bits}), b ->
                   CASE WHEN vt[b + 1] > 0 THEN (1::BIGINT << b)
                        ELSE 0 END)) AS BIGINT) AS simhash32
        FROM votes ORDER BY doc_id
    """


def _cdc_replay_sql(extra_where: str = "") -> str:
    """DuckDB oracle for the full CDC replay (queries.cdc_replay_synthetic).

    Recomputes, from the same ``events`` columns the change stream is
    derived from: the quarantine rule (op='X' rows excluded), the
    per-url last-writer-wins winner (window over warc_ts desc, lsn
    desc — the dedup + cross-batch MERGE fold collapsed into one
    window, valid because the final state per key is the global max),
    the text the html extractor must emit (title + h1 + body with tags
    stripped and whitespace collapsed), and the stopword-vote language
    tag (fillers chosen so the vote is unambiguous; shared via
    queries.CDC_FILLERS).
    """
    from giraffe_etl_spark.queries import CDC_FILLERS

    fillers = ", ".join(f"'{t}'" for _, t in CDC_FILLERS)
    langs = ", ".join(f"'{code}'" for code, _ in CDC_FILLERS)
    return f"""
        WITH ch AS (
          SELECT event_id AS lsn,
                 'http://host' || CAST(user_id % 20 AS VARCHAR)
                   || '.example.org/page/' || CAST(user_id AS VARCHAR) AS url,
                 ts AS warc_ts,
                 CASE WHEN event_id % 97 = 0 THEN 'X'
                      WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 [{fillers}][CAST(user_id % 5 AS INTEGER) + 1] AS filler,
                 [{langs}][CAST(user_id % 5 AS INTEGER) + 1] AS lang
          FROM events),
        valid AS (SELECT * FROM ch WHERE op <> 'X' {extra_where}),
        win AS (
          SELECT *, row_number() OVER (
                     PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
          FROM valid)
        SELECT url, warc_ts,
               'doc ' || CAST(lsn AS VARCHAR) || ' ' || url || ' '
                 || filler || ' rev ' || CAST(lsn AS VARCHAR) AS text,
               lang
        FROM win WHERE rn = 1 AND op <> 'D'
        ORDER BY url
    """


def _cdc_point_lookup_sql() -> str:
    """Replay final state restricted to the shared point-lookup keys.

    Same recomputation as ``_cdc_replay_sql`` filtered to the key list
    ``queries.CDC_LOOKUP_USER_IDS`` derives — a hash match proves the
    bucket-pruned ``read_keys`` path returns exactly what a full scan
    plus filter would.
    """
    from giraffe_etl_spark.queries import cdc_lookup_urls

    keys = ", ".join(f"'{u}'" for u in cdc_lookup_urls())
    return (
        f"SELECT * FROM ({_cdc_replay_sql()}) "
        f"WHERE url IN ({keys}) ORDER BY url"
    )


def _cdc_changelog_sql() -> str:
    """DuckDB oracle for the batch-1 changelog (queries.cdc_changelog_read).

    The changelog rows a MOR commit emits are the batch's within-batch
    LWW winners: upserts with the extracted text + voted lang, deletes
    as tombstones with null payload.  Recomputable with one window over
    the batch's share of the events-derived change stream (lsn % 3 = 1,
    op='X' rows quarantined away).
    """
    from giraffe_etl_spark.queries import CDC_FILLERS

    fillers = ", ".join(f"'{t}'" for _, t in CDC_FILLERS)
    langs = ", ".join(f"'{code}'" for code, _ in CDC_FILLERS)
    return f"""
        WITH ch AS (
          SELECT event_id AS lsn,
                 'http://host' || CAST(user_id % 20 AS VARCHAR)
                   || '.example.org/page/' || CAST(user_id AS VARCHAR) AS url,
                 ts AS warc_ts,
                 CASE WHEN event_id % 97 = 0 THEN 'X'
                      WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 [{fillers}][CAST(user_id % 5 AS INTEGER) + 1] AS filler,
                 [{langs}][CAST(user_id % 5 AS INTEGER) + 1] AS lang
          FROM events),
        valid AS (SELECT * FROM ch WHERE op <> 'X' AND lsn % 3 = 1),
        win AS (
          SELECT *, row_number() OVER (
                     PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
          FROM valid)
        SELECT url, warc_ts, lsn, (op = 'D') AS deleted,
               CASE WHEN op <> 'D' THEN
                 'doc ' || CAST(lsn AS VARCHAR) || ' ' || url || ' '
                   || filler || ' rev ' || CAST(lsn AS VARCHAR) END AS text,
               CASE WHEN op <> 'D' THEN lang END AS lang
        FROM win WHERE rn = 1
        ORDER BY url, lsn
    """


def _cdc_preimage_sql() -> str:
    """DuckDB oracle for the batch-1 changelog WITH pre-images.

    'after' = batch 1's within-batch LWW winners (same recomputation as
    ``_cdc_changelog_sql``).  'before' = the prior reconciled winner of
    every key batch 1 touched — i.e. batch 0's LWW winners (including
    delete winners, which the table holds as tombstones) restricted to
    batch 1's key set.  Keys first seen in batch 1 contribute no
    'before' row.
    """
    from giraffe_etl_spark.queries import CDC_FILLERS

    fillers = ", ".join(f"'{t}'" for _, t in CDC_FILLERS)
    langs = ", ".join(f"'{code}'" for code, _ in CDC_FILLERS)
    return f"""
        WITH ch AS (
          SELECT event_id AS lsn,
                 'http://host' || CAST(user_id % 20 AS VARCHAR)
                   || '.example.org/page/' || CAST(user_id AS VARCHAR) AS url,
                 ts AS warc_ts,
                 CASE WHEN event_id % 97 = 0 THEN 'X'
                      WHEN event_id % 10 < 6 THEN 'I'
                      WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
                 [{fillers}][CAST(user_id % 5 AS INTEGER) + 1] AS filler,
                 [{langs}][CAST(user_id % 5 AS INTEGER) + 1] AS lang
          FROM events),
        b0w AS (
          SELECT *, row_number() OVER (
                     PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
          FROM ch WHERE op <> 'X' AND lsn % 3 = 0),
        b1w AS (
          SELECT *, row_number() OVER (
                     PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
          FROM ch WHERE op <> 'X' AND lsn % 3 = 1),
        halves AS (
          SELECT url, warc_ts, lsn, (op = 'D') AS deleted,
                 CASE WHEN op <> 'D' THEN
                   'doc ' || CAST(lsn AS VARCHAR) || ' ' || url || ' '
                     || filler || ' rev ' || CAST(lsn AS VARCHAR) END AS text,
                 CASE WHEN op <> 'D' THEN lang END AS lang,
                 'after' AS change_type
          FROM b1w WHERE rn = 1
          UNION ALL
          SELECT url, warc_ts, lsn, (op = 'D') AS deleted,
                 CASE WHEN op <> 'D' THEN
                   'doc ' || CAST(lsn AS VARCHAR) || ' ' || url || ' '
                     || filler || ' rev ' || CAST(lsn AS VARCHAR) END AS text,
                 CASE WHEN op <> 'D' THEN lang END AS lang,
                 'before' AS change_type
          FROM b0w WHERE rn = 1
            AND url IN (SELECT DISTINCT url FROM b1w))
        SELECT * FROM halves ORDER BY url, change_type, lsn
    """


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_changelog_read": _cdc_changelog_sql(),
        "lang_vote_rollup": _lang_vote_sql(),
        "lang_tag_documents": _lang_tag_docs_sql(),
        "simhash_documents": _simhash_md5_sql(),
        "cdc_replay_synthetic": _cdc_replay_sql(),
        # the follower replica and the rescaled table must be
        # content-identical to the plain replay's final state — the
        # SAME oracle proves content-preservation, not just row counts
        "cdc_follow_replica": _cdc_replay_sql(),
        "cdc_rescale_replay": _cdc_replay_sql(),
        # evolution detour (add/rename/widen/drop mid-stream) and the
        # object-store-metadata replay must both be content-exact, so
        # they share the plain replay's oracle too
        "cdc_evolution_replay": _cdc_replay_sql(),
        "cdc_object_store_replay": _cdc_replay_sql(),
        # maintenance (compaction+expiry mid-stream) and the external
        # CAS catalog may never change content: same replay oracle
        "cdc_maintained_replay": _cdc_replay_sql(),
        "cdc_catalog_replay": _cdc_replay_sql(),
        "cdc_point_lookup": _cdc_point_lookup_sql(),
        # rollback to the post-batch-1 snapshot == a replay that never
        # saw batch 2 (lsn % 3 == 2)
        "cdc_rollback_replay": _cdc_replay_sql("AND lsn % 3 <> 2"),
        "cdc_changelog_preimage": _cdc_preimage_sql(),
        # the commit history is deterministic: create at id 0, one
        # delta-append per batch, each adding one winner row-version
        # per distinct key in the batch
        "cdc_meta_history": """
            WITH ch AS (
              SELECT event_id AS lsn,
                     'http://host' || CAST(user_id % 20 AS VARCHAR)
                       || '.example.org/page/' || CAST(user_id AS VARCHAR)
                       AS url,
                     CASE WHEN event_id % 97 = 0 THEN 'X'
                          WHEN event_id % 10 < 6 THEN 'I'
                          WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op
              FROM events),
            counts AS (
              SELECT CAST(lsn % 3 AS INT) AS b,
                     COUNT(DISTINCT url) AS n
              FROM ch WHERE op <> 'X' GROUP BY 1)
            SELECT CAST(0 AS BIGINT) AS snapshot_id, 'create' AS operation,
                   CAST(0 AS BIGINT) AS row_versions
            UNION ALL
            SELECT CAST(b + 1 AS BIGINT), 'delta-append',
                   CAST(SUM(n) OVER (ORDER BY b) AS BIGINT)
            FROM counts
            ORDER BY snapshot_id
        """,
        # the partial replica must equal filter(where) over a recompute
        "cdc_filtered_follow": (
            f"SELECT * FROM ({_cdc_replay_sql()}) "
            "WHERE lang = 'en' ORDER BY url"
        ),
        # the differential rollup must equal recompute-from-scratch
        # over the final replay state
        "cdc_incremental_rollup": f"""
            SELECT lang, CAST(count(*) AS DOUBLE) AS n_pages,
                   CAST(sum(length(text)) AS DOUBLE) AS chars
            FROM ({_cdc_replay_sql()})
            GROUP BY lang ORDER BY lang
        """,
        # time travel reads the post-batch-1 snapshot (batches 0+1)
        # AFTER batch 2 landed — same bounded-replay oracle as rollback
        "cdc_time_travel": _cdc_replay_sql("AND lsn % 3 <> 2"),
        # the column-pruned derived replica's rollup must equal the
        # same aggregate over the full replay's final state
        "cdc_derived_rollup": f"""
            SELECT lang, CAST(count(*) AS BIGINT) AS n_pages,
                   max(warc_ts) AS latest_warc_ts
            FROM ({_cdc_replay_sql()})
            GROUP BY lang ORDER BY lang
        """,
        "minhash_dedup_documents": """
            SELECT doc_id FROM documents
            UNION ALL
            SELECT doc_id + 200000 AS doc_id FROM documents WHERE doc_id % 5 = 1
            ORDER BY doc_id
        """,
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
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate <  TIMESTAMP '1996-10-01'
              AND EXISTS (
                    SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "q6_revenue_delta": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "purchase_and_error_users": """
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
            ORDER BY user_id
        """,
        "events_running_total": """
            SELECT user_id, event_id,
                   round(sum(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                       AS running_value
            FROM events
            ORDER BY user_id, event_id
        """,
        "events_sessionize": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR date_diff('second', lag(ts) OVER w, ts) > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id,
                     sum(new_sess) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS session_id
              FROM g
            )
            SELECT user_id,
                   CAST(max(session_id) AS BIGINT) AS n_sessions,
                   round(count(*) / CAST(max(session_id) AS DOUBLE), 4)
                       AS avg_events_per_session
            FROM s
            GROUP BY user_id
            ORDER BY user_id
        """,
        "events_props_topk": """
            SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
                   count(*) AS n
            FROM events
            GROUP BY k
            ORDER BY n DESC, k
            LIMIT 20
        """,
        "events_rollup_day_type": """
            SELECT event_type, date_trunc('day', ts) AS day,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY ROLLUP (event_type, date_trunc('day', ts))
            ORDER BY event_type NULLS FIRST, day NULLS FIRST
        """,
        "part_price_stats": """
            SELECT p_brand, count(*) AS n_parts,
                   round(avg(p_retailprice), 2) AS avg_price,
                   round(max(p_retailprice) - min(p_retailprice), 2)
                       AS price_range
            FROM part
            GROUP BY p_brand
            ORDER BY p_brand
        """,
        "url_parse_hosts": """
            WITH u AS (
              SELECT doc_id,
                     'http://' || source || '.example.org/docs/' ||
                     CAST(doc_id AS VARCHAR) || '?b=2&a=1' AS url
              FROM documents
            )
            SELECT regexp_extract(url, 'http://([^/?#]+)', 1) AS host,
                   count(*) AS n_urls,
                   min(regexp_extract(url, 'http://[^/?#]+([^?#]*)', 1))
                       AS min_path,
                   max(regexp_extract(url, '\\?(.*)$', 1)) AS max_query
            FROM u
            GROUP BY host
            ORDER BY host
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
        "embedding_neardup": """
            SELECT vec_id AS id_a,
                   vec_id + 100000 AS id_b,
                   round(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       CAST(embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings
            WHERE vec_id < 10
            ORDER BY id_a, id_b
        """,
        "media_features": """
            WITH m AS (
              SELECT doc_id AS media_id,
                     regexp_replace(substr(text, 1, 200), '[^ -~]', '', 'g') AS s
              FROM documents WHERE doc_id < 200
            )
            SELECT media_id,
                   CAST(length(s) AS BIGINT) AS n_bytes,
                   CASE WHEN length(s) > 0
                        THEN 16 + ascii(substr(s, 1, 1)) % 64 END AS width,
                   CASE WHEN length(s) > 0
                        THEN 16 + ascii(substr(s, length(s), 1)) % 64 END AS height,
                   CASE WHEN length(s) > 0 THEN CAST(len(list_filter(
                        range(1, length(s)+1),
                        i -> ascii(substr(s, i, 1)) % 8 = 0)) AS BIGINT) END AS h0,
                   CASE WHEN length(s) > 0 THEN CAST(len(list_filter(
                        range(1, length(s)+1),
                        i -> ascii(substr(s, i, 1)) % 8 = 1)) AS BIGINT) END AS h1,
                   CASE WHEN length(s) > 0 THEN CAST(len(list_filter(
                        range(1, length(s)+1),
                        i -> ascii(substr(s, i, 1)) % 8 = 2)) AS BIGINT) END AS h2,
                   CASE WHEN length(s) > 0 THEN CAST(len(list_filter(
                        range(1, length(s)+1),
                        i -> ascii(substr(s, i, 1)) % 8 = 3)) AS BIGINT) END AS h3,
                   CASE WHEN length(s) > 0 THEN CAST(len(list_filter(
                        range(1, length(s)+1),
                        i -> ascii(substr(s, i, 1)) % 8 = 4)) AS BIGINT) END AS h4,
                   CASE WHEN length(s) > 0 THEN CAST(len(list_filter(
                        range(1, length(s)+1),
                        i -> ascii(substr(s, i, 1)) % 8 = 5)) AS BIGINT) END AS h5,
                   CASE WHEN length(s) > 0 THEN CAST(len(list_filter(
                        range(1, length(s)+1),
                        i -> ascii(substr(s, i, 1)) % 8 = 6)) AS BIGINT) END AS h6,
                   CASE WHEN length(s) > 0 THEN CAST(len(list_filter(
                        range(1, length(s)+1),
                        i -> ascii(substr(s, i, 1)) % 8 = 7)) AS BIGINT) END AS h7
            FROM m ORDER BY media_id
        """,
        # real-codec round-trip: the Spark side ENCODES deterministic
        # grayscale PNGs and DECODES them through the stdlib PNG codec
        # (multimodal.png_decode: IHDR parse + IDAT inflate + defilter);
        # the oracle recomputes width/height and the pixel-byte
        # histogram from the doc_id formula alone, so a hash match
        # proves the decoder read real pixel data
        "media_png_decode": """
            WITH m AS (
              SELECT doc_id AS media_id,
                     4 + doc_id % 13 AS w,
                     3 + doc_id % 11 AS h
              FROM documents WHERE doc_id < 120
            )
            SELECT media_id,
                   CAST(w AS BIGINT) AS width,
                   CAST(h AS BIGINT) AS height,
                   CAST(len(list_filter(range(0, w*h),
                        i -> (media_id + i) % 8 = 0)) AS BIGINT) AS h0,
                   CAST(len(list_filter(range(0, w*h),
                        i -> (media_id + i) % 8 = 1)) AS BIGINT) AS h1,
                   CAST(len(list_filter(range(0, w*h),
                        i -> (media_id + i) % 8 = 2)) AS BIGINT) AS h2,
                   CAST(len(list_filter(range(0, w*h),
                        i -> (media_id + i) % 8 = 3)) AS BIGINT) AS h3,
                   CAST(len(list_filter(range(0, w*h),
                        i -> (media_id + i) % 8 = 4)) AS BIGINT) AS h4,
                   CAST(len(list_filter(range(0, w*h),
                        i -> (media_id + i) % 8 = 5)) AS BIGINT) AS h5,
                   CAST(len(list_filter(range(0, w*h),
                        i -> (media_id + i) % 8 = 6)) AS BIGINT) AS h6,
                   CAST(len(list_filter(range(0, w*h),
                        i -> (media_id + i) % 8 = 7)) AS BIGINT) AS h7
            FROM m ORDER BY media_id
        """,
        "typed_convert_events": """
            WITH raw AS (
              SELECT event_id,
                CASE WHEN event_id % 41 = 0 THEN ''
                     ELSE CAST(user_id AS VARCHAR) END AS raw_user,
                CASE WHEN event_id % 37 = 0 THEN 'x' || printf('%.2f', value)
                     ELSE printf('%.2f', value) END AS raw_value,
                CASE WHEN event_id % 43 = 0 THEN 'not-a-ts'
                     ELSE strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END AS raw_ts
              FROM events)
            SELECT event_id,
                   coalesce(TRY_CAST(raw_user AS BIGINT), -1) AS user_id,
                   round(TRY_CAST(raw_value AS DOUBLE), 2) AS value,
                   TRY_CAST(raw_ts AS TIMESTAMP) AS ts,
                   concat_ws(',',
                     CASE WHEN TRY_CAST(raw_value AS DOUBLE) IS NULL
                          THEN 'cast:value' END,
                     CASE WHEN TRY_CAST(raw_ts AS TIMESTAMP) IS NULL
                          THEN 'cast:ts' END) AS err
            FROM raw ORDER BY event_id
        """,
        "weblog_parse_stats": """
            WITH g AS (
              SELECT CASE WHEN event_id % 29 = 0 THEN '_corrupt'
                          ELSE 'host' || CAST(user_id % 20 AS VARCHAR)
                               || '.example.org' END AS host,
                     CASE WHEN event_id % 29 = 0 THEN -1
                          WHEN event_id % 17 = 0 THEN 404
                          ELSE 200 END AS status
              FROM events)
            SELECT host, status, count(*) AS n
            FROM g GROUP BY host, status ORDER BY host, status
        """,
        "httpget_parse": """
            SELECT event_id,
                   'GET' AS method,
                   'host' || CAST(user_id % 20 AS VARCHAR) || '.example.org' AS host,
                   '/page/' || CAST(user_id AS VARCHAR) || '/../'
                     || CAST(event_id AS VARCHAR) || '?b=2&a=1' AS document,
                   'HTTP/1.0' AS protocol,
                   'http://host' || CAST(user_id % 20 AS VARCHAR)
                     || '.example.org/page/' || CAST(event_id AS VARCHAR)
                     || '?a=1&b=2' AS url
            FROM events ORDER BY event_id
        """,
        "ua_classify": """
            WITH c AS (
              SELECT CASE CAST(user_id % 6 AS INTEGER)
                       WHEN 0 THEN 'chrome' WHEN 1 THEN 'safari'
                       WHEN 2 THEN 'safari_mobile' WHEN 3 THEN 'chrome_mobile'
                       WHEN 4 THEN 'googlebot' ELSE 'unknown' END AS family,
                     CASE CAST(user_id % 6 AS INTEGER)
                       WHEN 0 THEN '120.0' WHEN 1 THEN '605.1'
                       WHEN 2 THEN '604.1' WHEN 3 THEN '120.0'
                       WHEN 4 THEN '2.1' END AS version,
                     CASE CAST(user_id % 6 AS INTEGER)
                       WHEN 0 THEN 'en-us' END AS language,
                     CASE CAST(user_id % 6 AS INTEGER)
                       WHEN 0 THEN 'windows' WHEN 1 THEN 'macos'
                       WHEN 2 THEN 'ios' WHEN 3 THEN 'android'
                       WHEN 4 THEN 'bot' ELSE 'unknown' END AS os,
                     CASE CAST(user_id % 6 AS INTEGER)
                       WHEN 0 THEN '10.0' WHEN 1 THEN '13_1'
                       WHEN 2 THEN '17_0' WHEN 3 THEN '14' END AS os_version,
                     CASE CAST(user_id % 6 AS INTEGER)
                       WHEN 2 THEN 'iphone' WHEN 3 THEN 'Pixel 8' END AS model,
                     CASE CAST(user_id % 6 AS INTEGER)
                       WHEN 0 THEN 'desktop' WHEN 1 THEN 'desktop'
                       WHEN 2 THEN 'mobile' WHEN 3 THEN 'mobile'
                       WHEN 4 THEN 'bot' ELSE 'unknown' END AS device
              FROM events)
            SELECT family, version, language, os, os_version, model, device,
                   count(*) AS n
            FROM c GROUP BY ALL ORDER BY family, os
        """,
        "geoip_enrich": """
            WITH h AS (SELECT user_id % 60 AS hid FROM events)
            SELECT CASE WHEN hid < 50 THEN
                     ['us','de','fr','jp','br'][CAST(hid % 5 AS INTEGER) + 1]
                   END AS country,
                   count(*) AS n,
                   count(DISTINCT hid) AS n_hosts,
                   sum(CASE WHEN hid < 50 THEN 64512 + hid % 1024 END) AS sum_asn,
                   count(DISTINCT CASE WHEN hid < 50
                         THEN 'c' || CAST(hid % 13 AS VARCHAR) END) AS n_cities,
                   sum(CASE WHEN hid < 50 THEN hid - 89.5 END) AS sum_lat
            FROM h GROUP BY country ORDER BY country
        """,
        "rdns_hosts": """
            WITH ips AS (
                SELECT '10.0.' || (user_id % 16) || '.' || (user_id % 100) AS ip,
                       user_id
                FROM events)
            SELECT 'ptr-' || replace(ip, '.', '-') || '.example.org' AS host,
                   count(*) AS n,
                   count(DISTINCT user_id) AS n_users
            FROM ips GROUP BY host ORDER BY n DESC, host LIMIT 25
        """,
        "keyset_assign_documents": """
            WITH k AS (
              SELECT doc_id,
                     source || '-' || CAST(doc_id % 37 AS VARCHAR) AS key
              FROM documents),
            b1 AS (SELECT DISTINCT key FROM k WHERE doc_id % 2 = 0),
            b2new AS (
              SELECT DISTINCT key FROM k
              WHERE key NOT IN (SELECT key FROM b1)),
            a1 AS (
              SELECT key,
                     row_number() OVER (ORDER BY key) - 1 AS dense_id
              FROM b1),
            a2 AS (
              SELECT key,
                     (SELECT count(*) FROM b1)
                       + row_number() OVER (ORDER BY key) - 1 AS dense_id
              FROM b2new)
            SELECT key, CAST(dense_id AS BIGINT) AS dense_id FROM a1
            UNION ALL
            SELECT key, CAST(dense_id AS BIGINT) AS dense_id FROM a2
            ORDER BY key
        """,
        "doc_dense_ids": """
            SELECT doc_id, lang,
                   row_number() OVER (ORDER BY lang, doc_id) - 1 AS dense_id
            FROM documents ORDER BY doc_id
        """,
    }
