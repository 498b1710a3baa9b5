"""Changelog follower: keep a downstream replica in sync with O(changes) I/O.

The consumer half of the CDC story.  ``CdcApplier`` turns a change
stream into lake-table commits; ``ChangelogFollower`` turns those
commits back into a change stream and applies it to a replica table —
a downstream materialized copy (different bucket count, different
cluster, different storage tier) that never re-reads the source's base
data.

Mechanics (all reusing the table primitives):

- each ``sync()`` diffs the source's snapshot manifests since the last
  cursor (driver-side JSON, no data I/O) and classifies every commit
  by its ``operation`` summary tag:

  * ``append`` / ``delta-append`` — the added files ARE the change
    rows (upserts + tombstones under merge-on-read); scanned once and
    committed into the replica as one delta-append,
  * ``compact`` / ``rescale`` / ``metadata`` — content-preserving:
    skipped (the replica's logical content is unaffected),
  * ``overwrite`` / ``rollback`` — content-CHANGING rewrites: the
    changelog cannot express them, so ``sync`` raises and the operator
    re-bootstraps (same contract as Iceberg's changelog scan for
    replace snapshots),

- the cursor (``follow.src_snapshot``) is stored in the REPLICA's
  snapshot properties, so advancing it is atomic with the data commit:
  a crashed sync replays idempotently — exactly-once, the same trick
  the applier uses for its batch offsets,

- last-writer-wins reconciliation is by the table's ``merge.order``
  (globally-ordered (warc_ts, _lsn)), so folding several source
  commits into one replica commit cannot change any winner,

- source schema evolution propagates structurally: the change scan
  maps added files onto the source's CURRENT schema by column id, and
  ``sync`` auto-adds/auto-widens replica columns to match (renames are
  a manual replica operation — by-name matching cannot see them).

At 100 TB: sync I/O is bounded by the changed files, the manifest walk
is O(commits), and the replica write path is the same single-exchange
delta-append the applier uses.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..lake.table import SnapshotExpired, Table

# operations whose added files are change rows
_APPEND_OPS = {"append", "delta-append"}
# operations that restate logical content without changing it
_PRESERVING_OPS = {"compact", "rescale", "metadata", "create"}

_CURSOR_PROP = "follow.src_snapshot"


class ResyncRequired(Exception):
    """The source history contains a content-changing rewrite."""


class ChangelogFollower:
    """Tail a source ``Table``'s commit log into a replica ``Table``."""

    #: cursor value meaning "created, bootstrap copy not yet committed"
    _BOOTSTRAPPING = "-1"

    def __init__(
        self,
        spark: SparkSession,
        src: Table,
        dst_path: str,
        n_buckets: int | None = None,
        compact_threshold: int = 16,
    ):
        self.spark = spark
        self.src = src
        # replica MOR maintenance: fold a bucket's deltas into its base
        # above this many delta files (0 disables) — without it an
        # un-compacted replica's read-side reconcile grows unboundedly
        self.compact_threshold = compact_threshold
        if Table.exists(dst_path):
            self.dst = Table.load(spark, dst_path)
            if self.dst.properties.get(_CURSOR_PROP, self._BOOTSTRAPPING) == (
                self._BOOTSTRAPPING
            ):
                # a prior constructor crashed between Table.create and
                # the bootstrap data commit: the sentinel cursor marks
                # the copy as incomplete — redo it (idempotent: the
                # real cursor lands only inside the copy's own commit)
                self._bootstrap()
            return
        # bootstrap: replica shares the source's CURRENT schema and
        # merge spec; bucket count is the replica's own choice.  The
        # cursor is created as a SENTINEL and set to the real source
        # snapshot only inside the bootstrap data commit below — the
        # two-commit create is therefore crash-atomic (a crash between
        # them leaves the sentinel, and reconstruction redoes the copy
        # instead of silently skipping all pre-cursor rows).
        snap = src.current_snapshot()
        props = {
            k: v
            for k, v in snap.properties.items()
            if k in ("merge.key", "merge.order", "stats.cols")
        }
        props[_CURSOR_PROP] = self._BOOTSTRAPPING
        self.dst = Table.create(
            spark,
            dst_path,
            src._current_struct(snap),
            bucket_key=snap.properties["bucket.key"],
            n_buckets=n_buckets or int(snap.properties["bucket.count"]),
            properties=props,
        )
        self._bootstrap()

    def _bootstrap(self) -> None:
        """Initial copy: reconciled current content, cursor set with it.

        O(table) once, O(changes) forever after.  ONE commit carries
        both the data and the real cursor (an empty source commits the
        cursor as a metadata-only snapshot), so any crash point replays
        idempotently — re-running stacks duplicate row VERSIONS at
        worst, which per-key LWW reconcile collapses.
        """
        snap = self.src.current_snapshot()
        self._evolve_dst_to_src(snap)
        full = self.src.read(snap, reconcile=True)
        if full.take(1):
            self.dst.append_deltas(
                None,
                full,
                properties_update={_CURSOR_PROP: str(snap.snapshot_id)},
            )
            self._compact_if_needed()
        else:
            self.dst.set_properties({_CURSOR_PROP: str(snap.snapshot_id)})

    @property
    def cursor(self) -> int:
        return int(self.dst.properties[_CURSOR_PROP])

    def _evolve_dst_to_src(self, src_snap) -> None:
        """Auto-add / auto-widen replica columns to match the source."""
        src_fields = {f["name"]: f["type"] for f in src_snap.schema_fields}
        dst_fields = {
            f["name"]: f["type"]
            for f in self.dst.current_snapshot().schema_fields
        }
        extra = set(dst_fields) - set(src_fields)
        if extra:
            raise ResyncRequired(
                f"replica has columns the source lacks: {sorted(extra)} — "
                "a source column was renamed or dropped; rename it on the "
                "replica manually or re-bootstrap"
            )
        for name, typ in src_fields.items():
            if name not in dst_fields:
                self.dst.add_column(name, typ)
            elif dst_fields[name] != typ:
                self.dst.widen_column(name, typ)

    def sync(self) -> dict:
        """Apply all source commits since the cursor; returns a report."""
        head = self.src.current_snapshot()
        cur = self.cursor
        if head.snapshot_id <= cur:
            return {"commits": 0, "files": 0, "src_snapshot": cur}
        entries: list[dict] = []
        n_commits = 0
        try:
            commits = self.src.commits_between(cur, head.snapshot_id)
        except SnapshotExpired as e:
            raise ResyncRequired(
                f"follower cursor (snapshot {cur}) fell behind the source's "
                f"retention window ({e}) — the intervening changes are gone; "
                "re-bootstrap the replica from a full scan"
            ) from None
        for snap, added, removed in commits:
            op = snap.summary.get("operation", "unknown")
            if op in _PRESERVING_OPS:
                continue
            if op not in _APPEND_OPS or removed:
                raise ResyncRequired(
                    f"source snapshot {snap.snapshot_id} is a "
                    f"content-changing '{op}' commit "
                    f"({len(removed)} file(s) removed) — the changelog "
                    "cannot express it; re-bootstrap the replica"
                )
            n_commits += 1
            entries.extend(added)
        if not entries:
            # nothing but preserving commits: advance the cursor only
            self.dst.set_properties({_CURSOR_PROP: str(head.snapshot_id)})
            return {"commits": 0, "files": 0, "src_snapshot": head.snapshot_id}
        self._evolve_dst_to_src(head)
        changes = self.src._scan(head, entries, with_bucket_col=False)
        # touched buckets derive from the committed manifest diff
        # (bucket_ids=None) — per-sync manifest metadata is O(touched
        # replica buckets), not O(all buckets)
        self.dst.append_deltas(
            None,
            changes,
            properties_update={_CURSOR_PROP: str(head.snapshot_id)},
        )
        self._compact_if_needed()
        return {
            "commits": n_commits,
            "files": len(entries),
            "src_snapshot": head.snapshot_id,
        }

    def _compact_if_needed(self) -> None:
        """Fold replica deltas above the threshold (same policy as the
        applier) so read-side reconcile cost stays bounded."""
        if self.compact_threshold:
            self.dst.compact_deltas(max_delta_files=self.compact_threshold)
