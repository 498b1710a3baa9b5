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

Object-store strategy (implemented by ``MemoryObjectStoreIO`` below,
which emulates exactly these semantics so the whole commit/concurrency
suite can run against them — see tests/test_fileio.py):

- **create-if-absent**: S3 conditional PUT with ``If-None-Match: *``
  (generally available since 2024) or GCS ``x-goog-if-generation-match:
  0`` — both reject the PUT if the key exists, which is this primitive
  exactly.  Azure Blob: ``If-None-Match: *`` likewise.
- **pointer flip**: a plain PUT is atomic per-object on all three
  stores, which satisfies the no-torn-read requirement.  It is also
  sufficient for lost-update protection here because the pointer is
  only ever flipped by the writer that WON the manifest
  create-if-absent for that snapshot id, and a writer committing id
  N+1 must first have observed the pointer at N — so at most one PUT
  per value, ordered by the manifest creates.  Deployments that want
  belt-and-braces can instead CAS the pointer (``If-Match`` on the
  ETag / GCS generation) or move ONLY the pointer into a catalog with
  compare-and-swap (DynamoDB item, JDBC row, REST catalog) while
  manifests and data stay on the object store — the seam admits that
  by overriding ``flip_pointer`` alone.

Data files are NOT routed through this seam: they are written by
Spark's own writers via the Hadoop FileSystem for whatever scheme the
table path carries, and are content-immutable once committed — only
the metadata protocol needs the primitives above.
"""

from __future__ import annotations

import os
import threading
import time
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

    def flip_pointer(self, path: str, content: str, expected: str | None = None) -> None:
        """Atomically replace ``path`` with ``content``.

        ``expected`` is the pointer value the committing writer
        believes is current (``None`` = the pointer must not exist
        yet).  Plain-PUT implementations may IGNORE it — sufficient
        because the manifest create-if-absent already linearizes
        committers (see module docstring) — while catalog-backed
        implementations honor it as a true compare-and-swap and raise
        ``catalog_http.CasConflict`` on mismatch (converted to
        ``CommitConflict`` by the commit path, which then retries
        against the fresh snapshot).
        """
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def delete_if_matches(self, path: str, content: str) -> bool:
        """Delete ``path`` only if its current content equals ``content``.

        Returns True iff the delete happened.  This is the
        owner-checked delete the commit protocol uses everywhere a
        writer removes a manifest it believes it created (conflict
        cleanup) or believes is an abandoned orphan (reaping): the
        manifest doc embeds a per-attempt ``writer_nonce``, so two
        writers' docs for the same snapshot id are never byte-equal,
        and a compare-then-delete can never destroy a manifest that
        was re-created by someone else in between.

        The default implementation is read-compare-delete.  On POSIX
        that leaves a one-syscall window between compare and unlink;
        it is acceptable there because the only racer that could slip
        in must itself first delete the path (create_if_absent fails
        on an existing file), making our delete a FileNotFoundError,
        not a wrong-victim delete.  Object stores should override with
        a conditional delete (S3 ``DeleteObject`` + ``If-Match`` ETag,
        GCS ``if-generation-match``) to close even that window — see
        ``MemoryObjectStoreIO``.
        """
        try:
            if self.read_text(path) != content:
                return False
            self.delete(path)
            return True
        except (FileNotFoundError, OSError):
            return False

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

    def flip_pointer(self, path: str, content: str, expected: str | None = None) -> None:
        # plain atomic PUT; ``expected`` ignored (see base docstring)
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


class MemoryObjectStoreIO(FileIO):
    """In-memory store exposing exactly the guarantees S3-class stores give.

    The point of this class is to PROVE (under the concurrency test
    suite) that the commit protocol needs nothing POSIX: no
    directories, no rename, no link — only

    - a conditional PUT that fails when the key already exists
      (``If-None-Match: *``): ``create_if_absent`` takes the lock once,
      checks, writes — the same atomicity the store's conditional
      write gives;
    - a plain atomic PUT for the pointer: ``flip_pointer`` replaces the
      value in one assignment, so readers see old-or-new, never torn.

    Directory semantics are emulated only as far as the ``Table``
    metadata layer uses them: ``makedirs(exist_ok=False)`` is the
    table-create exclusivity check (maps to a marker-object conditional
    PUT on a real store), and ``list_dir`` lists immediate children by
    key prefix (maps to LIST with ``delimiter=/``).  Data files never
    route through this seam (they go via Spark's Hadoop FileSystem),
    so a Table on this IO keeps its parquet on local disk while ALL
    metadata — manifests, shards, the ``_current`` pointer — lives in
    the object store.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._objects: dict[str, tuple[str, float]] = {}
        self._dirs: set[str] = set()

    def create_if_absent(self, path: str, content: str) -> None:
        with self._lock:
            if path in self._objects:
                raise FileExistsError(path)
            self._objects[path] = (content, time.time())

    def flip_pointer(self, path: str, content: str, expected: str | None = None) -> None:
        # plain atomic PUT; ``expected`` ignored (see base docstring)
        with self._lock:
            self._objects[path] = (content, time.time())

    def read_text(self, path: str) -> str:
        with self._lock:
            try:
                return self._objects[path][0]
            except KeyError:
                raise FileNotFoundError(path) from None

    def exists(self, path: str) -> bool:
        with self._lock:
            return path in self._objects or path in self._dirs

    def delete(self, path: str) -> None:
        with self._lock:
            try:
                del self._objects[path]
            except KeyError:
                raise FileNotFoundError(path) from None

    def delete_if_matches(self, path: str, content: str) -> bool:
        # Atomic compare-and-delete under the store lock — the
        # semantics of S3 DeleteObject with If-Match (ETag) or GCS
        # delete with if-generation-match: no window at all between
        # the compare and the delete.
        with self._lock:
            ent = self._objects.get(path)
            if ent is None or ent[0] != content:
                return False
            del self._objects[path]
            return True

    def list_dir(self, path: str) -> list[str]:
        prefix = path.rstrip("/") + "/"
        with self._lock:
            children = set()
            for key in self._objects:
                if key.startswith(prefix):
                    children.add(key[len(prefix):].split("/", 1)[0])
            for key in self._dirs:
                if key.startswith(prefix):
                    children.add(key[len(prefix):].split("/", 1)[0])
            return sorted(children)

    def makedirs(self, path: str, exist_ok: bool = True) -> None:
        path = path.rstrip("/")
        with self._lock:
            if not exist_ok and path in self._dirs:
                raise FileExistsError(path)
            self._dirs.add(path)

    def mtime(self, path: str) -> float:
        with self._lock:
            try:
                return self._objects[path][1]
            except KeyError:
                raise FileNotFoundError(path) from None
