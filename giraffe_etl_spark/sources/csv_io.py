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
    rows carry the raw offending line in ``line``.

    Default (line-oriented) path — the 100 TB shape: the files are
    scanned as TEXT and parsed with the ``from_csv`` expression
    (JVM-side, whole-stage codegen).  Because the corrupt marker is a
    derived expression over the text scan — not the CSV source's
    internal corrupt column — both routes are plain streaming filters:
    NOTHING is cached, each route is one bounded pass over the splits.
    (Spark's native CSV source requires materializing the whole parsed
    frame before its corrupt column may be referenced — an unbounded
    cache of the raw input, wrong at scale.)

    ``multiline=True``: required to read back values with embedded
    quoted newlines; falls back to the native CSV source, which makes
    each FILE (not each split) the unit of parallelism AND needs the
    corrupt-column materialization — bounded here by a
    MEMORY_AND_DISK persist (spills, never OOMs).  Leave it off for
    100 TB line-oriented logs and scrub newlines at export time.
    """
    from pyspark.sql.types import StructType

    full_schema = schema_ddl + f", {CORRUPT_COL} string"
    if multiline:
        from pyspark import StorageLevel

        df = (
            spark.read.schema(full_schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .option("sep", sep)
            .option("header", str(header).lower())
            .option("quote", quote)
            .option("escape", escape)
            .option("multiLine", "true")
            .csv(path)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        parsed = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        quarantined = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
            F.col(CORRUPT_COL).alias("line")
        )
        return parsed, quarantined

    opts = {
        "sep": sep,
        "quote": quote,
        "escape": escape,
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
    }
    raw = spark.read.text(path)
    if header:
        # from_csv has no header concept; drop lines equal to the
        # schema's header row (written by write_csv with these names)
        hdr = sep.join(StructType.fromDDL(schema_ddl).fieldNames())
        raw = raw.filter(F.col("value") != hdr)
    rec = F.from_csv(F.col("value"), full_schema, opts)
    df = raw.select(F.col("value"), rec.alias("_r"))
    parsed = df.filter(F.col(f"_r.{CORRUPT_COL}").isNull()).select("_r.*").drop(
        CORRUPT_COL
    )
    quarantined = df.filter(F.col(f"_r.{CORRUPT_COL}").isNotNull()).select(
        F.col("value").alias("line")
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
