"""Parity: the JVM expression twin of extract_text vs the pure function.

The expression (functions/text_expr.py) claims byte-identical output to
``extract_text`` for every valid-UTF-8 input.  These tests check the
claim on adversarial fixtures, on the change generator's actual html
(multibyte fillers, emoji comments, invalid-byte rows), and on
hypothesis-generated tag soup; plus the guard's exactness (valid UTF-8
in, invalid out) and the whitespace-class equivalence that the parity
proof leans on.
"""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from giraffe_etl_spark.functions.text import extract_text
from giraffe_etl_spark.functions.text_expr import (
    _PY_WS_CLASS,
    extract_text_utf8_expr,
    html_is_utf8,
)

FIXTURES = [
    b"", b"   ", b"plain text",
    b'<html><head><title>T</title><script>var x="<b>";</script></head>'
    b"<body>Hello <b>world</b></body></html>",
    b"<ScRiPt src=x>alert(1)</sCrIpT >after",
    b'<style media="x">p{color:red}</style>text',
    b"<!-- c --><p>a</p><!-- multi\nline -->b",
    b"a &amp;lt; b &lt; c &gt; d &quot;q&quot; &#39;s&#39; &apos;t&apos;"
    b" &nbsp; e &amp; f",
    b"&amp;amp; &amp;&amp; &&amp; &amp;nbsp;",
    b'unterminated <tag attr="x',
    b"tab\there\nnewline\x0bvtab\x0cff\rcr  multi  space",
    b"\x01control\x02 chars \x1f info-seps-collapse",
    b"<script>no close tag",
    b"<p>edge</p >",
    b"lone & ampersand &unknown; entity",
    b"< notatag", b">stray<",
    b"<script>a</script><script>b</script>c",
    b"&lt;script&gt;not code&lt;/script&gt;",
    "<p>caf\xe9 \xfcber r\xf3ka 　ideographic space</p>".encode(),
    "nbsp\xa0char  figure  narrow".encode(),
    "next\x85line  ogham  lsep  psep".encode(),
    "    en/em spaces   hair".encode(),
    "zwsp​ is NOT whitespace ​ ok".encode(),
    "emoji \U0001f600 in text <b>tag</b>".encode(),
    "<!-- comment \U0001f600 --><p>x</p>".encode(),
]

INVALID = [b"invalid \xff\xfe utf8", b"trunc \xc3",
           b"overlong \xc0\xaf enc", b"surrogate \xed\xa0\x80 enc"]


def _spark_results(spark, blobs):
    df = spark.createDataFrame([(b,) for b in blobs], "html binary")
    ok = html_is_utf8(F.col("html"))
    return df.select(
        ok.alias("ok"),
        F.when(ok, extract_text_utf8_expr(F.col("html"))).alias("t"),
        "html",
    ).collect()


def test_parity_on_fixtures_and_generator_html(spark):
    from giraffe_etl_spark.cdc.generate import (
        ChangeGenConfig,
        gen_change_batch,
        gen_pages,
    )

    blobs = list(FIXTURES) + list(INVALID)
    blobs += [bytes(h) for h in gen_pages(150, seed=3, html_size=512)["html"]]
    ch = gen_change_batch(ChangeGenConfig(n_keys=64, html_size=1024), 0, 150)
    blobs += [bytes(h) for h in ch["html"] if h is not None]

    fast = invalid = 0
    for r in _spark_results(spark, blobs):
        raw = bytes(r.html)
        if not r.ok:
            invalid += 1
            with pytest.raises(UnicodeDecodeError):
                raw.decode("utf-8")  # guard must never reject valid UTF-8
            continue
        fast += 1
        assert r.t == extract_text(raw), raw[:80]
    assert fast > 200 and invalid >= len(INVALID)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.sampled_from(
                ["<p>", "</p>", "<script>", "</script>", "<style>", "</Style >",
                 "<!--", "-->", "&amp;", "&lt;", "&nbsp;", "&amp;lt;", "<",
                 ">", "&", " ", "\t", "\n", " ", " ", "café"]
            ),
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
                max_size=12,
            ),
        ),
        max_size=24,
    )
)
def test_parity_property_tag_soup(spark, soup):
    html = "".join(soup).encode("utf-8")
    [r] = _spark_results(spark, [html])
    assert r.ok  # built from valid text, must take the fast path
    assert r.t == extract_text(html)


def test_ws_class_equals_python_str_whitespace():
    """The spelled-out class is EXACTLY Python's str-level \\s over the BMP."""
    ours = re.compile(_PY_WS_CLASS.rstrip("+") + "$")
    for cp in range(0x10000):
        ch = chr(cp)
        assert bool(ours.match(ch)) == bool(re.match(r"\s", ch)), hex(cp)
