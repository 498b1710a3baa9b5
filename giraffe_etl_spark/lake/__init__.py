from .table import CommitConflict, Snapshot, SnapshotExpired, Table

__all__ = ["Table", "Snapshot", "CommitConflict", "SnapshotExpired"]
