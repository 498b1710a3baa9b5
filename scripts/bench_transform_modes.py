#!/usr/bin/env python
"""A/B: fused Arrow UDF vs JVM-expression twin for html -> (text, lang).

Settles by measurement which side of the JVM/Python boundary the
html-to-text extraction belongs on (the same method that settled
window-vs-rank_join dedup and mor-vs-cow merge):

- **A (shipped default)**: ``extract_text_lang_udf`` — html crosses to
  Python once per batch (Arrow), CPython's C regex engine strips tags
  on raw bytes, (text, lang) cross back.
- **B**: ``extract_text_utf8_expr`` — a parity-proven Catalyst
  expression chain (3 regexp_replace + 7 replace + collapse) handles
  valid-UTF-8 rows JVM-side; Python sees only invalid rows plus the
  extracted text for the language vote.

Measured result (local[4], 2M events x 1KB html, min of 2 warm runs,
recorded in BASELINE.md): A = 46.7 s, B = 124.8 s — the expression
twin is 2.7x SLOWER despite saving the html Arrow crossing, because
five Java regex/replace passes allocate a fresh string each over every
page, while the single Arrow crossing amortizes to less than that.
The UDF therefore stays the default; the expression twin remains as a
parity-tested alternative (functions/text_expr.py) for environments
where Python workers are the constrained resource.

Usage: python scripts/bench_transform_modes.py [--events 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--html-size", type=int, default=1024)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from giraffe_etl_spark.cdc.generate import ChangeGenConfig, changes_df
    from giraffe_etl_spark.functions.text_expr import (
        extract_text_utf8_expr,
        html_is_utf8,
    )
    from giraffe_etl_spark.functions.udf import extract_text_lang_udf, tag_lang_udf
    from giraffe_etl_spark.session import get_spark

    spark = get_spark("bench-transform", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = ChangeGenConfig(n_keys=args.events // 8, html_size=args.html_size)
    log = os.path.join(tempfile.mkdtemp(prefix="bench_tf_"), "log")
    changes_df(spark, args.events, cfg, partitions=64).write.parquet(log)
    df = spark.read.parquet(log)

    def timed(out):
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            out.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        return round(best, 2)

    h = F.col("html")
    tl = extract_text_lang_udf(h)
    mode_a = df.select("url", tl["text"].alias("text"), tl["lang"].alias("lang"))

    ok = html_is_utf8(h)
    jvm_text = F.when(ok, extract_text_utf8_expr(h))
    slow = extract_text_lang_udf(F.when(~ok, h))
    fast_lang = tag_lang_udf(jvm_text)
    mode_b = df.select(
        "url",
        F.when(ok, jvm_text).otherwise(slow["text"]).alias("text"),
        F.when(ok, fast_lang).otherwise(slow["lang"]).alias("lang"),
    )

    a, b = timed(mode_a), timed(mode_b)
    print(json.dumps({
        "metric": "html->text+lang transform A/B",
        "events": args.events, "cores": args.cores,
        "fused_udf_sec": a, "jvm_expr_sec": b,
        "winner": "fused_udf" if a <= b else "jvm_expr",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
