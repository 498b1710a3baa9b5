from .dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
    simhash_expr,
)
from .similarity import brute_force_topk, embedding_neardup_pairs, lsh_topk
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
    "brute_force_topk",
    "lsh_topk",
    "embedding_neardup_pairs",
    "with_lang",
    "with_quality",
    "with_token_count",
    "with_fingerprint",
    "char_stats",
    "token_count_expr",
]
