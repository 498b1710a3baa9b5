"""Structured Streaming front-end for the CDC apply stage.

The batch applier is already exactly-once (offset watermark inside the
table commit), so the streaming integration is the thin, idiomatic
``foreachBatch`` pattern: Structured Streaming handles source offset
tracking / retries, and every micro-batch funnels through
``CdcApplier.apply_batch(batch_df, epoch_id)`` — a replayed epoch after
a failure is detected by the table-side watermark and becomes a no-op,
which is exactly the contract foreachBatch requires for end-to-end
exactly-once sinks.

Reference analog: giraffe's bounded-queue micro-batching + drain
protocol (SURVEY.md §2.9), replaced by micro-batch triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..cdc.apply import CdcApplier

CHANGES_DDL = "lsn long, op string, url string, warc_ts timestamp, html binary"


def read_change_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Tail a directory of change-batch parquet files as a stream.

    This is the sandbox stand-in for a Kafka/binlog source; swap with
    ``spark.readStream.format("kafka")`` + a payload parser in
    production — everything downstream is source-agnostic.
    """
    return (
        spark.readStream.schema(StructType.fromDDL(CHANGES_DDL))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def start_apply_stream(
    changes: DataFrame,
    applier: CdcApplier,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the apply stage per micro-batch; returns the StreamingQuery."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        applier.apply_batch(batch_df, batch_id=int(epoch_id))
        applier.maintain(int(epoch_id))

    writer = (
        changes.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
