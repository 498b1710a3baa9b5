from .dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
    simhash_expr,
    simhash_md5_expr,
)
from .classify import DEFAULT_RULES, classify_expr, classify_join, classify_scan, rules_df
from .enrich import enrich_hosts, geo_table, reenrich_stale
from .keyset import PersistentKeyset, dense_ids, dense_ids_ordered
from .rdns import resolve_hosts, reverse_dns_expr, reverse_dns_udf
from .similarity import brute_force_topk, embedding_neardup_pairs, lsh_topk
from .weblog import parse_weblog, weblog_stats
from .textstats import (
    char_stats,
    token_count_expr,
    with_fingerprint,
    with_lang,
    with_quality,
    with_token_count,
)

__all__ = [
    "exact_dedup",
    "minhash_lsh_candidates",
    "minhash_lsh_dedup",
    "ngram_jaccard_pairs",
    "simhash_dedup",
    "simhash_expr",
    "simhash_md5_expr",
    "brute_force_topk",
    "lsh_topk",
    "embedding_neardup_pairs",
    "with_lang",
    "with_quality",
    "with_token_count",
    "with_fingerprint",
    "char_stats",
    "token_count_expr",
    "classify_expr",
    "classify_join",
    "classify_scan",
    "rules_df",
    "DEFAULT_RULES",
    "enrich_hosts",
    "geo_table",
    "reenrich_stale",
    "dense_ids",
    "dense_ids_ordered",
    "PersistentKeyset",
    "resolve_hosts",
    "reverse_dns_expr",
    "reverse_dns_udf",
    "parse_weblog",
    "weblog_stats",
]
