"""External-catalog pointer CAS: the commit protocol against a real
separate process.

``fileio.py`` argues that a plain atomic PUT is *sufficient* for the
``_current`` pointer because the manifest create-if-absent already
linearizes committers.  Production lakehouses still often want the
pointer in a catalog with compare-and-swap (DynamoDB conditional
writes, a JDBC row, an Iceberg REST catalog's ``commit`` endpoint)
so that the pointer flip itself is a CAS and a moved pointer is a
*rejected write*, not just a pre-flip check.  This module provides
that deployment shape end-to-end inside the sandbox:

- ``CatalogServer`` — a ~100-line stdlib HTTP key-value catalog
  (separate process boundary: real sockets, real serialization) whose
  PUT is conditional on the caller's expected current value, the same
  contract as Iceberg's REST catalog ``updateTable`` requirements or a
  DynamoDB ``ConditionExpression``.
- ``HttpCatalogIO`` — a ``FileIO`` that keeps manifests / shards /
  markers on any delegate IO (POSIX dir, object store) and routes ONLY
  the ``_current`` pointer through the catalog, overriding
  ``flip_pointer`` with a true CAS.  A CAS rejection surfaces as
  ``CasConflict``; ``Table._write_snapshot`` converts it into
  ``CommitConflict`` so the optimistic-retry loop re-reads and
  re-composes — the retry-on-CAS-failure path a plain-PUT deployment
  never exercises.

Behavior studied (not ported) from the reference's terminal/catalog
plumbing (giraffe-etl TerminalFactory); the CAS protocol itself is the
standard catalog-commit contract from the Iceberg spec.
"""

from __future__ import annotations

import os
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .fileio import FileIO, PosixFileIO

# sentinel for "the key must not exist yet" in the CAS header
_ABSENT = "__absent__"


class CasConflict(Exception):
    """Catalog rejected a conditional PUT: expected value didn't match."""


class CatalogServer:
    """Minimal catalog process: a key-value store with CAS PUT.

    Endpoints (key passed as the query string's ``key``):
      GET    /kv?key=K                     -> 200 value | 404
      PUT    /kv?key=K  X-Expected: V|__absent__  body=new
                                           -> 204 | 412 (CAS mismatch)
      DELETE /kv?key=K                     -> 204 | 404

    The compare-and-swap runs under one lock — the catalog, being a
    single authority, is what makes the pointer flip linearizable,
    exactly the role DynamoDB/JDBC/REST catalogs play for Iceberg.
    """

    def __init__(self) -> None:
        self._kv: dict[str, str] = {}
        self._lock = threading.Lock()
        self.cas_failures = 0  # observability for tests
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _key(self):
                q = urllib.parse.urlparse(self.path).query
                return urllib.parse.parse_qs(q).get("key", [None])[0]

            def do_GET(self):
                key = self._key()
                with server._lock:
                    val = server._kv.get(key)
                if val is None:
                    self.send_response(404)
                    self.end_headers()
                else:
                    body = val.encode()
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)

            def do_PUT(self):
                key = self._key()
                n = int(self.headers.get("Content-Length", 0))
                new = self.rfile.read(n).decode()
                expected = self.headers.get("X-Expected")
                with server._lock:
                    cur = server._kv.get(key)
                    if expected is not None:
                        want = None if expected == _ABSENT else expected
                        if cur != want:
                            server.cas_failures += 1
                            self.send_response(412)
                            self.end_headers()
                            return
                    server._kv[key] = new
                self.send_response(204)
                self.end_headers()

            def do_DELETE(self):
                key = self._key()
                with server._lock:
                    existed = server._kv.pop(key, None) is not None
                self.send_response(204 if existed else 404)
                self.end_headers()

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def start(self) -> "CatalogServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "CatalogServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


class HttpCatalogIO(FileIO):
    """FileIO whose ``_current`` pointer lives in an external catalog.

    Everything except the pointer (manifests, shards, the table-create
    marker) goes to ``delegate`` — the fileio.py strategy of "move ONLY
    the pointer into a catalog with compare-and-swap while manifests
    and data stay on the object store", realized.  ``flip_pointer``
    sends a conditional PUT: ``expected`` (the committing writer's
    parent pointer value, or None for the creating commit) rides the
    ``X-Expected`` header and a 412 raises ``CasConflict``.
    """

    def __init__(self, catalog_url: str, delegate: FileIO | None = None):
        self.catalog_url = catalog_url.rstrip("/")
        self.delegate = delegate or PosixFileIO()

    # -- pointer routing ------------------------------------------------

    @staticmethod
    def _is_pointer(path: str) -> bool:
        return os.path.basename(path) == "_current"

    def _kv_url(self, path: str) -> str:
        return f"{self.catalog_url}/kv?key={urllib.parse.quote(path, safe='')}"

    def _request(self, method: str, path: str, data: bytes | None = None,
                 headers: dict | None = None):
        req = urllib.request.Request(
            self._kv_url(path), data=data, method=method,
            headers=headers or {},
        )
        return urllib.request.urlopen(req, timeout=10)

    # -- FileIO surface -------------------------------------------------

    def flip_pointer(self, path: str, content: str, expected: str | None = None) -> None:
        if not self._is_pointer(path):
            self.delegate.flip_pointer(path, content)
            return
        try:
            self._request(
                "PUT", path, data=content.encode(),
                headers={"X-Expected": _ABSENT if expected is None else expected},
            )
        except urllib.error.HTTPError as e:
            if e.code == 412:
                raise CasConflict(
                    f"catalog rejected pointer CAS for {path}: "
                    f"expected {expected!r}"
                ) from None
            raise

    def read_text(self, path: str) -> str:
        if not self._is_pointer(path):
            return self.delegate.read_text(path)
        try:
            with self._request("GET", path) as resp:
                return resp.read().decode()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(path) from None
            raise

    def exists(self, path: str) -> bool:
        if not self._is_pointer(path):
            return self.delegate.exists(path)
        try:
            with self._request("GET", path):
                return True
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return False
            raise

    def delete(self, path: str) -> None:
        if not self._is_pointer(path):
            self.delegate.delete(path)
            return
        try:
            self._request("DELETE", path)
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(path) from None
            raise

    # pointer files are never create_if_absent'd / mtime'd by the
    # protocol; pure delegation for everything else
    def create_if_absent(self, path: str, content: str) -> None:
        self.delegate.create_if_absent(path, content)

    def delete_if_matches(self, path: str, content: str) -> bool:
        if self._is_pointer(path):
            raise NotImplementedError(
                "pointer files are flipped via CAS, never owner-deleted"
            )
        return self.delegate.delete_if_matches(path, content)

    def list_dir(self, path: str) -> list[str]:
        names = set(self.delegate.list_dir(path))
        # surface the pointer for listings of its parent dir so
        # maintenance walks see the same namespace either way
        if self.exists(os.path.join(path, "_current")):
            names.add("_current")
        return sorted(names)

    def makedirs(self, path: str, exist_ok: bool = True) -> None:
        self.delegate.makedirs(path, exist_ok=exist_ok)

    def mtime(self, path: str) -> float:
        return self.delegate.mtime(path)
