"""Differential aggregate views maintained from changelog pre-images.

``ChangelogFollower`` keeps a keyed COPY in sync; ``IncrementalRollup``
keeps an AGGREGATE in sync without any copy at all.  Each ``sync()``
reads the source window once with ``read_changes(with_pre_images=True)``
and applies the signed contributions — 'after' rows add, 'before' rows
retract — to a tiny rollup table, the standard retraction form of
incremental view maintenance for additive aggregates (count, sum).
Non-additive aggregates (max/min/distinct) are deliberately out of
scope: a retraction can invalidate them without enough information to
recompute incrementally.

Cost per sync at 100 TB: O(changed files) scan + the bucket-pruned
pre-image read (both from ``read_changes``), one partial-aggregated
shuffle down to |groups| rows, and an O(groups) copy-on-write rewrite
of the rollup table — the source's base data is never re-read and no
keyed replica is stored.  Exactly-once comes from the same trick the
applier and follower use: the source-snapshot cursor is committed
atomically WITH the rollup data, so a crashed sync replays
idempotently.

Behavior studied (not ported): the reference has no changelog and no
derived-view maintenance; its nearest analog is re-running an
aggregating process over re-imported output files
(libgiraffe2 src/dataprocessor/processing_node.cpp task chains).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..lake.table import SnapshotExpired, Table
from .follow import ResyncRequired

_CURSOR_PROP = "rollup.src_snapshot"
#: persisted view definition — reopening with a different one must fail
#: loudly, not silently mix deltas computed under two definitions
_SPEC_PROP = "rollup.spec"
#: hidden live-row count per group: group existence tracks it exactly,
#: so a group whose user measures net to 0 but still has live rows
#: survives — byte-for-byte what a recompute would report
_ROWS_COL = "_rows"


class IncrementalRollup:
    """Maintain ``SELECT group_cols, SUM(measure)... GROUP BY group_cols``
    over a CDC source table, differentially.

    ``measures``: name -> SQL expression string evaluated on a
    changelog row (e.g. ``{"n_pages": "1", "chars": "length(text)"}``).
    Expressions must be additive and null-free on live rows (wrap with
    ``coalesce`` if a column can be null); tombstone halves contribute
    nothing by construction.  A hidden live-row count decides group
    existence: a group leaves the rollup exactly when its last live row
    is deleted, never because a signed user measure happens to net to
    zero.  The definition (group columns, measure expressions, deleted
    column) is persisted at creation; reopening an existing rollup with
    a different one raises instead of silently stacking deltas computed
    under two definitions.
    """

    def __init__(
        self,
        spark: SparkSession,
        src: Table,
        dst_path: str,
        group_cols: list[str],
        measures: dict[str, str],
        deleted_col: str = "_deleted",
        on_rewrite: str = "error",
    ):
        """``on_rewrite``: forwarded to ``read_changes``.  The default
        refuses windows containing rewrite commits; pass "skip" when
        the source's rewrites are known to be content-preserving MOR
        compactions (the applier's default maintenance) — their added
        files restate rows and carry no new contributions.  Operational
        only, so it may differ between opens (unlike the definition)."""
        self.spark = spark
        self.src = src
        self.group_cols = list(group_cols)
        self.measures = dict(measures)
        self.deleted_col = deleted_col
        self.on_rewrite = on_rewrite
        if not self.measures:
            raise ValueError("at least one measure is required")
        bad = [
            m for m in self.measures
            if m.startswith("_") or m in self.group_cols
        ]
        if bad:
            raise ValueError(
                f"measure names may not start with '_' or shadow group "
                f"columns: {bad}"
            )
        spec = json.dumps(
            {
                "group_cols": self.group_cols,
                "measures": self.measures,
                "deleted_col": self.deleted_col,
            },
            sort_keys=True,
        )
        if Table.exists(dst_path):
            self.dst = Table.load(spark, dst_path)
            stored = self.dst.properties.get(_SPEC_PROP)
            if stored is not None and stored != spec:
                raise ValueError(
                    "rollup already exists with a different definition "
                    f"(stored {stored}, requested {spec}) — syncing would "
                    "stack deltas computed under two definitions"
                )
            if self.dst.properties.get(_CURSOR_PROP) == self._BOOTSTRAPPING:
                # a prior constructor crashed between Table.create and
                # the seed commit: the sentinel marks the rollup as
                # unseeded — redo it (idempotent: the real cursor lands
                # only inside the seed's own commit, same crash-atomic
                # two-commit create the follower uses)
                self._seed()
            return
        src_snap = src.current_snapshot()
        src_types = {f["name"]: f["type"] for f in src_snap.schema_fields}
        unknown = [c for c in self.group_cols if c not in src_types]
        if unknown:
            raise ValueError(f"group columns not in source schema: {unknown}")
        ddl = ", ".join(
            [f"{c} {src_types[c]}" for c in self.group_cols]
            + [f"{m} double" for m in self.measures]
            + [f"{_ROWS_COL} double"]
        )
        from pyspark.sql.types import StructType

        # the rollup is |groups| rows: one bucket keeps every sync's
        # copy-on-write rewrite a single tiny file
        self.dst = Table.create(
            spark,
            dst_path,
            StructType.fromDDL(ddl),
            bucket_key=self.group_cols[0],
            n_buckets=1,
            properties={_CURSOR_PROP: self._BOOTSTRAPPING, _SPEC_PROP: spec},
        )
        self._seed()

    #: cursor value meaning "created, seed aggregate not yet committed"
    _BOOTSTRAPPING = "-1"

    def _seed(self) -> None:
        """Full aggregate of the CURRENT source state; the real cursor
        commits WITH it.  Also the recovery path: ``reseed()`` calls
        this when the cursor fell behind the source's retention window."""
        snap = self.src.current_snapshot()
        self.dst.overwrite_buckets(
            [0],
            self._aggregate_live(self.src.read(snap)),
            properties_update={_CURSOR_PROP: str(snap.snapshot_id)},
        )

    def reseed(self) -> None:
        """Re-bootstrap from a full scan (after ``ResyncRequired``)."""
        self._seed()

    @property
    def cursor(self) -> int:
        return int(self.dst.properties[_CURSOR_PROP])

    def _all_measures(self) -> dict[str, str]:
        return {**self.measures, _ROWS_COL: "1"}

    def _measure_cols(self, sign) -> list:
        return [
            F.sum(sign * F.expr(expr).cast("double")).alias(name)
            for name, expr in self._all_measures().items()
        ]

    def _aggregate_live(self, df: DataFrame) -> DataFrame:
        live = df.filter(~F.col(self.deleted_col)) if (
            self.deleted_col in df.columns
        ) else df
        return live.groupBy(*self.group_cols).agg(
            *self._measure_cols(F.lit(1.0))
        )

    def sync(self) -> dict:
        """Fold all source commits since the cursor into the rollup."""
        head = self.src.current_snapshot()
        cursor = self.cursor
        if head.snapshot_id <= cursor:
            return {"commits": 0, "src_snapshot": cursor}
        try:
            ch = self.src.read_changes(
                cursor,
                head.snapshot_id,
                with_pre_images=True,
                on_rewrite=self.on_rewrite,
            )
        except SnapshotExpired as e:
            raise ResyncRequired(
                f"rollup cursor (snapshot {cursor}) fell behind the "
                f"source's retention window ({e}) — the intervening "
                "changes are gone; call reseed() to re-bootstrap from a "
                "full scan"
            ) from None
        live = (
            ~F.col(self.deleted_col)
            if self.deleted_col in ch.columns
            else F.lit(True)
        )
        # LWW-correct differential: the window's raw 'after' versions
        # are CHANGE rows, not the new state — late data can lose to
        # the prior winner.  The post-state of a touched key is the
        # merge-order winner over {its 'before' row} U {its 'after'
        # versions} (reconcile is LWW on that same total order, so no
        # second table read is needed).  Contribution = +winner (if
        # live) - 'before' (if live); a window whose versions all lose
        # nets exactly zero.
        from pyspark.sql.window import Window

        props = head.properties
        key_cols = [c.strip() for c in props["merge.key"].split(",")]
        order_cols = [c.strip() for c in props["merge.order"].split(",")]
        w = Window.partitionBy(*key_cols).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        winner = F.row_number().over(w) == 1
        sign = (
            F.when(winner & live, F.lit(1.0)).otherwise(F.lit(0.0))
            + F.when(
                (F.col("_change_type") == "before") & live, F.lit(-1.0)
            ).otherwise(F.lit(0.0))
        )
        deltas = (
            ch.withColumn("_sign", sign)
            .filter(F.col("_sign") != 0.0)
            .groupBy(*self.group_cols)
            .agg(*self._measure_cols(F.col("_sign")))
        )
        # null-SAFE outer merge: a null group value is a legal group
        # (Spark's groupBy folds nulls into one group), but a plain
        # equi-join would never match it — current and delta null-group
        # rows would both survive as duplicates.  eqNullSafe pairs them.
        names = list(self._all_measures())
        cur_df = self.dst.read().select(
            *[F.col(c).alias(f"_cur_g_{c}") for c in self.group_cols],
            *[F.col(m).alias(f"_cur_{m}") for m in names],
        )
        cond = None
        for c in self.group_cols:
            e = cur_df[f"_cur_g_{c}"].eqNullSafe(deltas[c])
            cond = e if cond is None else (cond & e)
        merged = (
            cur_df.join(deltas, cond, "full_outer")
            .select(
                *[
                    F.coalesce(deltas[c], F.col(f"_cur_g_{c}")).alias(c)
                    for c in self.group_cols
                ],
                *[
                    (
                        F.coalesce(f"_cur_{m}", F.lit(0.0))
                        + F.coalesce(deltas[m], F.lit(0.0))
                    ).alias(m)
                    for m in names
                ],
            )
            # group existence tracks the live-row count EXACTLY: the
            # group vanishes when its last live row is deleted, and
            # only then (a user measure netting to 0 is a value, not
            # an absence)
            .filter(F.col(_ROWS_COL) != 0.0)
        )
        self.dst.overwrite_buckets(
            [0],
            merged,
            properties_update={_CURSOR_PROP: str(head.snapshot_id)},
        )
        return {"commits": 1, "src_snapshot": head.snapshot_id}

    def read(self) -> DataFrame:
        """The rollup: one row per group with live rows (the hidden
        existence counter stays internal)."""
        return self.dst.read().drop(_ROWS_COL)
