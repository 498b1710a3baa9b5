"""CSV ingestion with corrupt-record routing + escaped CSV export.

The read side is the TokenizerImporter CSV path: per-column delimiters,
quote/escape handling, and discard-routing of unparseable lines — all
via Spark's native CSV reader in PERMISSIVE mode with an explicit
corrupt-record column, so malformed lines surface as data (raw line
preserved) instead of killing the job.  The write side is the
StandardExporter analog: quoting/escaping handled by the writer.

Reference behavior studied (not ported): giraffe-etl
TokenizerImporter.java:40-451, StandardExporter escape/format logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORRUPT_COL = "_corrupt_record"


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    sep: str = ",",
    header: bool = False,
    quote: str = '"',
    escape: str = '"',
    multiline: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(parsed, quarantined) pair from a CSV file tree.

    ``parsed`` rows fully matched the declared schema; ``quarantined``
    rows carry the raw offending line in ``line``.  The reader is the
    JVM-native CSV source (pushdown-friendly, whole-stage codegen) —
    no Python in the path.

    ``multiline``: required to read back values with embedded quoted
    newlines, but it makes each FILE (not each split) the unit of
    parallelism — leave off for 100 TB line-oriented logs and scrub
    newlines at export time instead.
    """
    full_schema = schema_ddl + f", {CORRUPT_COL} string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("quote", quote)
        .option("escape", escape)
        .option("multiLine", str(multiline).lower())
        .csv(path)
        # columnNameOfCorruptRecord requires the parsed frame to be
        # materialized-with-corrupt-column before filtering on it
        .cache()
    )
    parsed = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantined = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("line")
    )
    return parsed, quarantined


def write_csv(
    df: DataFrame,
    path: str,
    sep: str = ",",
    header: bool = True,
    quote_all: bool = False,
) -> None:
    """Escaped CSV export (StandardExporter analog).

    Embedded separators, quotes, and newlines in values are
    quoted/escaped by the writer so the output round-trips through
    ``read_csv_quarantined`` losslessly.
    """
    (
        df.write.mode("overwrite")
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("quoteAll", str(quote_all).lower())
        .option("escape", '"')
        .csv(path)
    )
