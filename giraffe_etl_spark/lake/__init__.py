from .catalog_http import CasConflict, CatalogServer, HttpCatalogIO
from .fileio import FileIO, MemoryObjectStoreIO, PosixFileIO
from .table import CommitConflict, Snapshot, SnapshotExpired, Table

__all__ = [
    "Table", "Snapshot", "CommitConflict", "SnapshotExpired",
    "FileIO", "PosixFileIO", "MemoryObjectStoreIO",
    "CasConflict", "CatalogServer", "HttpCatalogIO",
]
