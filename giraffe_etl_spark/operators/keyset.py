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

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


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
