"""Raw-line ingestion with corrupt-record quarantine (TokenizerImporter).

Parses unstructured web-server log lines (Apache combined-ish) into a
typed record via one compiled regex inside whole-stage codegen;
unparseable lines are flagged, not dropped silently, matching the
reference's discard-route semantics.

Reference behavior studied (not ported): giraffe-etl
TokenizerImporter.java:40-451 (per-column delimiters/quotes, discard of
unparseable lines), StreamRecordImporter.java:31-114 (error routing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# host ident user [ts] "METHOD path PROTO" status bytes
WEBLOG_RE = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d{3}) (\d+|-)$'
)

_FIELDS = [
    ("host", 1, "string"),
    ("ident", 2, "string"),
    ("user", 3, "string"),
    ("ts_raw", 4, "string"),
    ("method", 5, "string"),
    ("path", 6, "string"),
    ("protocol", 7, "string"),
    ("status", 8, "int"),
    ("n_bytes", 9, "bigint"),
]


def parse_weblog(lines: DataFrame, col: str = "line") -> DataFrame:
    """line -> typed record + ``_corrupt`` flag.

    One regex pass per row (codegen, compiled once); a line that does
    not match the grammar yields nulls + ``_corrupt = true`` so the
    caller can route it to a dead-letter table with the raw line
    preserved.
    """
    c = F.col(col)
    ok = c.rlike(WEBLOG_RE)
    out = [
        F.when(ok, F.regexp_extract(c, WEBLOG_RE, i).try_cast(t)).alias(n)
        for n, i, t in _FIELDS
    ]
    return lines.select(c.alias("line"), *out, (~ok).alias("_corrupt"))


def weblog_stats(parsed: DataFrame) -> DataFrame:
    """Per-(host, status) counts; corrupt lines under host='_corrupt'.

    The discard route is measured, not hidden — the count of corrupt
    lines is part of the operator's contract.
    """
    shaped = parsed.select(
        F.when(F.col("_corrupt"), F.lit("_corrupt"))
        .otherwise(F.col("host"))
        .alias("host"),
        F.when(F.col("_corrupt"), F.lit(-1))
        .otherwise(F.col("status"))
        .alias("status"),
    )
    return (
        shaped.groupBy("host", "status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("host", "status")
    )
