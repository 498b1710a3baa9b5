from .text import (
    extract_text,
    fingerprint64,
    quality_score,
    tag_lang,
    token_count,
)
from .url import normalize_url, parse_url_components

__all__ = [
    "extract_text",
    "tag_lang",
    "token_count",
    "quality_score",
    "fingerprint64",
    "normalize_url",
    "parse_url_components",
]
