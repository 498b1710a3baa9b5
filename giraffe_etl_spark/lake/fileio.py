"""Metadata FileIO seam: the two primitives a lake commit needs.

``Table``'s commit protocol (lake/table.py) linearizes on exactly two
storage guarantees:

1. **create-if-absent** — exactly one of N racing writers may own a
   given manifest name (the commit's linearization point),
2. **pointer flip** — replacing the small ``_current`` file so readers
   see either the old or the new content, never a torn mix.

Everything else (reads, listings, deletes) needs only ordinary
consistency.  This module isolates those primitives behind ``FileIO``
so the protocol's correctness argument is portable across stores; the
POSIX implementation is the default and the only one shipped (the
sandbox has no object store to test against).

Object-store strategy (documented, not implemented):

- **create-if-absent**: S3 conditional PUT with ``If-None-Match: *``
  (generally available since 2024) or GCS ``x-goog-if-generation-match:
  0`` — both reject the PUT if the key exists, which is this primitive
  exactly.  Azure Blob: ``If-None-Match: *`` likewise.
- **pointer flip**: a plain PUT is atomic per-object on all three
  stores, which satisfies the no-torn-read requirement; the stronger
  lost-update protection the POSIX impl gets for free from the
  parent-id re-check under rename ordering should instead use a CAS
  (read the pointer's ETag/generation, conditional PUT with
  ``If-Match``) — or, as Iceberg production deployments do, move ONLY
  the pointer into a catalog with compare-and-swap (DynamoDB item,
  JDBC row, REST catalog) while manifests and data stay on the object
  store.

Data files are NOT routed through this seam: they are written by
Spark's own writers via the Hadoop FileSystem for whatever scheme the
table path carries, and are content-immutable once committed — only
the metadata protocol needs the primitives above.
"""

from __future__ import annotations

import os
import uuid


class FileIO:
    """Storage primitives for the snapshot-commit protocol.

    Implementations must guarantee:
    - ``create_if_absent`` raises ``FileExistsError`` if the path
      exists, and exactly one of N concurrent creators of the same
      path succeeds (atomicity of the existence check + write),
    - ``flip_pointer`` replaces the file so a concurrent reader sees
      the complete old or complete new content.
    """

    def create_if_absent(self, path: str, content: str) -> None:
        raise NotImplementedError

    def flip_pointer(self, path: str, content: str) -> None:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        raise NotImplementedError

    def makedirs(self, path: str, exist_ok: bool = True) -> None:
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        raise NotImplementedError


class PosixFileIO(FileIO):
    """Default implementation over a POSIX filesystem.

    ``os.link`` is the create-if-absent primitive: an exists-check
    followed by a rename is a TOCTOU race (two committers both pass the
    check, the second silently overwrites — found by the
    concurrent-applier test), while link(2) fails with ``EEXIST``
    atomically.  ``os.rename`` is the atomic pointer flip.  Both are
    fsync'd through a temp file first so a crash never exposes a
    partial manifest.
    """

    def create_if_absent(self, path: str, content: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        finally:
            os.remove(tmp)

    def flip_pointer(self, path: str, content: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        os.remove(path)

    def list_dir(self, path: str) -> list[str]:
        return os.listdir(path)

    def makedirs(self, path: str, exist_ok: bool = True) -> None:
        os.makedirs(path, exist_ok=exist_ok)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)
