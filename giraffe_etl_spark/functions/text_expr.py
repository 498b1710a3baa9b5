"""JVM expression twin of ``extract_text`` for valid-UTF-8 html.

Same design as the URL normalizer's expression twin (url_expr.py): the
pure-Python function (functions/text.py, shared with the oracle) stays
the source of truth, and a Catalyst-expression re-implementation
handles the rows where the two are PROVABLY byte-identical — here,
html whose bytes are valid UTF-8 (the overwhelming majority of a real
web-crawl stream).  Invalid-UTF-8 rows fall back to the Arrow UDF.
The win is bandwidth: the html payload (the widest column of the
stream) never crosses to Python for fast-path rows; only the extracted
text (a fraction of the html size) makes the crossing, for the
language vote.

Why valid UTF-8 is the exact guard (each step below matches
functions/text.py byte-for-byte on valid input; property-tested in
tests/test_text_expr.py, including an exhaustive whitespace-set sweep):

- *decode*: strict UTF-8 decode never hits a replacement on valid
  bytes, so Python's strip-bytes-then-decode equals Spark's
  decode-then-strip-string — PROVIDED the byte-level regexes and the
  char-level regexes find the same matches, which they do:
- *tag regexes*: every construct in the script/comment/tag patterns
  matches only ASCII bytes/chars (``<``, ``>``, letters, ``-``, bytes
  ``\\s`` = ``[ \\t\\n\\x0b\\f\\r]`` which equals Java's default
  ``\\s``).  In valid UTF-8, bytes >= 0x80 appear only inside
  multibyte sequences and can never alias an ASCII byte, so byte
  positions and char positions of every match coincide.  Alternation,
  backreference ``\\1``, ``[^>]``, lazy ``.*?`` with DOTALL and
  ASCII-only ``(?i)`` folding behave identically in both engines.
- *entities*: Python applies ONE left-to-right alternation pass.  The
  sequential ``replace`` chain below is equivalent because (a) no
  entity contains another entity or an inner ``&``, so original-string
  matches are disjoint and order-independent, and (b) only
  ``&amp;`` -> ``&`` can create new entity-shaped substrings, so it
  runs LAST and single-pass — created substrings survive literally,
  exactly as in the single alternation pass.
- *whitespace collapse*: Python's str-level ``\\s`` is the Unicode set
  {TAB LF VT FF CR, U+001C-001F, SPACE, U+0085, U+00A0, U+1680,
  U+2000-200A, U+2028, U+2029, U+202F, U+205F, U+3000} — NOT Java's
  default ``\\s`` (ASCII-only) and NOT Java's ``(?U)\\s``
  (Character.isWhitespace excludes the no-break spaces U+00A0/2007/
  202F).  The expression therefore spells the exact set out as a char
  class.
- *strip*: Python ``str.strip()`` removes that same set; after the
  collapse, leading/trailing runs are single ASCII spaces, so
  ``btrim(s, ' ')`` (NOT ``trim``, which also eats control chars
  <= 0x20 that Python keeps) is exact.

Invalid UTF-8 diverges for real reasons — tags must be stripped BEFORE
replacement-decoding so broken bytes inside tags vanish rather than
become U+FFFD — so the guard sends those rows to the UDF, never
approximates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCRIPT_STYLE = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
_COMMENT = r"(?s)<!--.*?-->"
_TAG = r"<[^>]*>"

# Python str-level \s, spelled out (see module docstring).
_PY_WS_CLASS = (
    "[ \t\n\x0b\x0c\r\x1c-\x1f\x85\xa0\u1680"
    "\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]+"
)

# (find, replace) in an order provably equivalent to the Python
# single-pass alternation — see module docstring; &amp; MUST be last.
_ENTITY_CHAIN = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_is_utf8(html: Column) -> Column:
    """True iff the html BINARY column is valid UTF-8 (fast-path guard)."""
    return F.call_function("is_valid_utf8", html)


def extract_text_utf8_expr(html: Column) -> Column:
    """``extract_text`` as a codegen'd expression — valid-UTF-8 inputs only.

    Callers must gate on ``html_is_utf8`` (ANSI ``decode`` would throw
    on invalid UTF-8, and CaseWhen branches evaluate lazily per row, so
    the gate also makes this exception-safe); null propagates like the
    Python function.
    """
    s = F.decode(html, "UTF-8")
    s = F.regexp_replace(s, _SCRIPT_STYLE, " ")
    s = F.regexp_replace(s, _COMMENT, " ")
    s = F.regexp_replace(s, _TAG, " ")
    for find, repl in _ENTITY_CHAIN:
        s = F.replace(s, F.lit(find), F.lit(repl))
    s = F.regexp_replace(s, _PY_WS_CLASS, " ")
    return F.btrim(s, F.lit(" "))
