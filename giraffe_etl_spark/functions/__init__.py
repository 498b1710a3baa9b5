from .text import (
    extract_text,
    fingerprint64,
    quality_score,
    tag_lang,
    token_count,
)
from .httpline import parse_http_get, with_http_get
from .url import normalize_url, normalize_url_simple, parse_url_components

__all__ = [
    "extract_text",
    "tag_lang",
    "token_count",
    "quality_score",
    "fingerprint64",
    "normalize_url",
    "normalize_url_simple",
    "parse_http_get",
    "with_http_get",
    "parse_url_components",
]
