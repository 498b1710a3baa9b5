"""Dense ID assignment (the NumberedKeyset analog).

The reference hands out dense sequential ids per key on first sight
(BDBNumberedKeyset.java:100-158, behavior studied — not ported).  The
naive Spark translation — ``row_number() OVER (ORDER BY ...)`` — is a
global-order window: every row through ONE reducer, dead at scale.
The scalable formulation is the classic two-phase zip:

1. one cheap job counts rows per partition,
2. cumulative offsets (a tiny driver-side list) are closed over by a
   ``mapInPandas`` pass that enumerates each partition locally —
   no shuffle of the data at all.

``dense_ids_ordered`` prepends a range-repartition + in-partition sort,
making the assignment equal to ``row_number() OVER (ORDER BY keys)-1``
(the oracle identity) while the heavy path stays fully parallel.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def dense_ids(df: DataFrame, out: str = "dense_id") -> DataFrame:
    """Assign dense ids 0..n-1 in partition-then-row order.

    Ids follow the CURRENT partitioning (like the reference's arrival
    order); persist ``df`` first if the upstream plan is
    nondeterministic, so the count job and the assignment job see the
    same partition contents.
    """
    src = df.withColumn("_pid", F.spark_partition_id())
    counts = {
        r["_pid"]: r["cnt"]
        for r in src.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, {out} bigint"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = offsets[pid] + seen.get(pid, 0)
            seen[pid] = seen.get(pid, 0) + len(pdf)
            pdf = pdf.drop(columns=["_pid"])
            pdf[out] = np.arange(start, start + len(pdf), dtype=np.int64)
            yield pdf

    return src.mapInPandas(assign, schema=schema)


class PersistentKeyset:
    """Stable dense IDs ACROSS runs — the BDBNumberedKeyset analog.

    The reference's keyset assigns a dense int id per distinct string on
    first sight and keeps it forever (``putNoOverwrite``,
    BDBNumberedKeyset.java:100-158 — behavior studied, not ported).
    Here the dictionary is a snapshot-isolated lake table
    ``(key string, dense_id long)``; ``assign_or_get`` extends it with
    unseen keys only:

    - existing keys keep their ids (anti-join finds the new ones),
    - new keys get ids ``max+1 ..`` in SORTED-KEY order within the call
      — a deterministic rule, so an external oracle can recompute every
      id from the batch history,
    - the running max rides the table properties and commits atomically
      with the new rows (one snapshot), so a crash between jobs never
      leaks or skips ids,
    - replaying a batch is a natural no-op: its keys already exist, the
      anti-join returns nothing, ids are unchanged (idempotent).

    Single-writer, like the apply stage.  Scale: the per-call work is
    one distinct + one anti-join on keys only (no payload), and the new
    slice's zip is the fully-parallel ``dense_ids_ordered``.
    """

    SCHEMA = "key string, dense_id long"

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 8):
        from ..lake import Table

        if Table.exists(path):
            self.table = Table.load(spark, path)
        else:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self.table = Table.create(
                spark,
                path,
                StructType.fromDDL(self.SCHEMA),
                bucket_key="key",
                n_buckets=n_buckets,
                properties={"keyset.max": "-1"},
            )

    def lookup(self) -> DataFrame:
        """The full dictionary (key, dense_id)."""
        return self.table.read()

    def assign_or_get(self, keys: DataFrame, key_col: str = "key") -> DataFrame:
        """Dictionary rows for every distinct non-null input key,
        extending the dictionary with the unseen ones.

        Scale shape: the dictionary is only ever read through the
        bucket transform — the batch's distinct keys hash to a bucket
        id set (one tiny driver-side collect, O(n_buckets) values), and
        both the anti-join (which keys are new?) and the id fetch scan
        ONLY those buckets' files.  A key can match only inside its own
        bucket, so the pruned scan is exact.  New keys' ids are read
        back from the files the append commit itself added (the
        manifest diff — O(new keys), durable, no recompute hazard),
        never by re-scanning the table.  A billion-url dictionary
        therefore costs each batch O(touched buckets) + O(new keys),
        not O(dictionary).
        """
        snap = self.table.current_snapshot()
        distinct = (
            keys.select(F.col(key_col).alias("key"))
            .filter(F.col(key_col).isNotNull())
            .distinct()
        )
        n_b = int(snap.properties["bucket.count"])
        bids = sorted(
            int(r["_b"])
            for r in distinct.select(
                F.pmod(F.hash(F.col("key")), F.lit(n_b)).cast("int").alias("_b")
            )
            .distinct()
            .collect()
        )
        cur = self.table.read(snap=snap, buckets=bids)
        new = distinct.join(cur.select("key"), "key", "left_anti").persist()
        try:
            n_new = new.count()
            added: list[dict] = []
            post = snap
            if n_new:
                offset = int(snap.properties.get("keyset.max", "-1")) + 1
                assigned = dense_ids_ordered(new, ["key"]).withColumn(
                    "dense_id", (F.col("dense_id") + offset).cast("long")
                )
                post = self.table.append(
                    assigned,
                    {"keyset.max": str(offset + n_new - 1)},
                    base=snap,
                )
                pre_paths = {
                    fi["path"] for fs in snap.buckets.values() for fi in fs
                }
                added = [
                    fi
                    for fs in post.buckets.values()
                    for fi in fs
                    if fi["path"] not in pre_paths
                ]
        finally:
            new.unpersist()
        existing = distinct.join(cur, "key")
        if not added:
            return existing
        newly = self.table._scan(post, added, with_bucket_col=False)
        return existing.unionByName(newly.select("key", "dense_id"))


def dense_ids_ordered(
    df: DataFrame, order_cols: list[str], out: str = "dense_id"
) -> DataFrame:
    """Dense ids following a total order, without a global-order window.

    Range-repartition on the order columns puts partition i strictly
    before partition i+1; the in-partition sort orders rows inside;
    the two-phase zip then yields exactly
    ``row_number() OVER (ORDER BY order_cols) - 1`` with every stage
    parallel (the only global object is the tiny offsets list).
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    return dense_ids(ordered, out=out)
