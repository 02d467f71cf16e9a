"""Metadata filesystem abstraction for the icelite table format.

The table's DATA files are always written/read by Spark executors
(spark.read/write handles any Hadoop-compatible URI natively). The
METADATA layer — snapshot manifests, the _current pointer, the commit
lock — is driver-side and small, and this module is its only I/O
boundary: ``LakeTable`` never touches ``os``/``open`` for metadata
directly, so deploying on an object store means implementing this
interface (4 primitives + 2 listings) over e.g. S3 conditional PUTs,
not rewriting the table format. Mirrors how Iceberg separates FileIO
from the catalog's atomic swap (public Iceberg spec; the reference's
analogue is its single KV-store state blob,
AbstractDebeziumTask.java:700-732).

Atomicity contract the implementations must honor:
- ``write_atomic``: readers see either the old or the complete new
  content, never a torn write (local: tmp + fsync + rename; object
  store: PUT is already atomic).
- ``create_exclusive``: succeeds for exactly one caller when racing
  (local: O_CREAT|O_EXCL; S3: If-None-Match conditional PUT; a
  catalog CAS also qualifies).
- ``rename_if_exists``: atomic move used for lock reclaim — only one
  of N racing renamers wins.
"""

from __future__ import annotations

import os
import threading
import uuid


class LocalMetaFS:
    """POSIX implementation — the sandbox/test default."""

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_atomic(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def list(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def walk_files(self, path: str, suffix: str) -> list[str]:
        out = []
        for root, _dirs, names in os.walk(path):
            for n in names:
                if n.endswith(suffix):
                    out.append(os.path.join(root, n))
        return sorted(out)

    def create_exclusive(self, path: str, text: str) -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, text.encode())
        finally:
            os.close(fd)
        return True

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass

    def rename_if_exists(self, src: str, dst: str) -> bool:
        try:
            os.rename(src, dst)
            return True
        except OSError:
            return False


class LocalDataFS:
    """Deletion boundary for the table's DATA files (parquet). Writes
    and reads go through Spark (any Hadoop URI); the only data-layer
    operation the table performs itself is reclaim — expire_snapshots
    deleting files no retained snapshot references. Kept separate from
    MetaFS because the scaling shape differs: metadata is a handful of
    small driver-side documents, data expiry is 10^5+ objects per pass
    on an object store, so the interface is BATCH delete and the local
    implementation already fans out (an S3 implementation maps it to
    DeleteObjects, 1000 keys per call)."""

    def delete_batch(self, paths: list[str]) -> int:
        """Delete; missing files are counted as already reclaimed
        (expiry re-runs must be idempotent). Returns #removed."""
        if not paths:
            return 0
        from concurrent.futures import ThreadPoolExecutor

        def _rm(p: str) -> int:
            try:
                os.remove(p)
                return 1
            except FileNotFoundError:
                return 0

        with ThreadPoolExecutor(
            max_workers=min(32, len(paths))
        ) as ex:
            return sum(ex.map(_rm, paths))


class InMemoryMetaFS:
    """Dict-backed implementation used by tests to PROVE the metadata
    layer has no hidden POSIX dependency: the full table lifecycle
    (create → commit → read → concurrent-commit conflict → stale-lock
    reclaim) runs with snapshot JSON, pointer, and lock living in this
    map while Spark keeps the data files wherever it likes."""

    def __init__(self) -> None:
        self.files: dict[str, str] = {}
        self._mu = threading.Lock()

    def mkdirs(self, path: str) -> None:
        pass  # directories are implicit, like an object store

    def exists(self, path: str) -> bool:
        p = path.rstrip("/")
        with self._mu:
            return p in self.files or any(
                k.startswith(p + "/") for k in self.files
            )

    def read_text(self, path: str) -> str:
        with self._mu:
            try:
                return self.files[path]
            except KeyError:
                raise FileNotFoundError(path) from None

    def write_atomic(self, path: str, text: str) -> None:
        with self._mu:
            self.files[path] = text

    def list(self, path: str) -> list[str]:
        p = path.rstrip("/") + "/"
        with self._mu:
            return sorted(
                {
                    k[len(p):].split("/", 1)[0]
                    for k in self.files
                    if k.startswith(p)
                }
            )

    def walk_files(self, path: str, suffix: str) -> list[str]:
        p = path.rstrip("/") + "/"
        with self._mu:
            return sorted(
                k for k in self.files if k.startswith(p) and k.endswith(suffix)
            )

    def create_exclusive(self, path: str, text: str) -> bool:
        with self._mu:
            if path in self.files:
                return False
            self.files[path] = text
            return True

    def delete(self, path: str) -> None:
        with self._mu:
            self.files.pop(path, None)

    def rename_if_exists(self, src: str, dst: str) -> bool:
        with self._mu:
            if src not in self.files:
                return False
            self.files[dst] = self.files.pop(src)
            return True
