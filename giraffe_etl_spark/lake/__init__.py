from .table import CommitConflict, Snapshot, Table

__all__ = ["Table", "Snapshot", "CommitConflict"]
