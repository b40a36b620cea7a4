"""Storage backend seam for the pool's metadata and layout operations.

The Pool's DATA path is Spark (``spark.read.parquet`` / ``df.write``),
which already speaks any Hadoop-compatible filesystem.  Everything
else — manifest and sidecar IO, commit-dir renames, the writer lock —
was raw ``os.*`` calls, i.e. posix-only.  This module puts those calls
behind one small interface so an object-storage pool only swaps the
backend object, never touches Pool logic.

Object-storage mapping (S3/GCS/ABFS), for the future backend:

- ``write_atomic``     -> a plain PUT (object stores are atomic per key;
                          no tmp+rename dance needed).
- ``rename`` (commit publish) -> server-side copy + delete, or better:
                          skip the rename entirely and write data to its
                          final key prefix, since VISIBILITY is carried
                          by the manifest, not the rename (the manifest
                          is the only thing readers list from).
- ``create_exclusive`` (writer lock) -> conditional put: S3
                          ``If-None-Match: *``, GCS
                          ``ifGenerationMatch=0``; stale-break maps to a
                          conditional DELETE on the observed
                          generation/ETag, which closes the TOCTOU the
                          posix path needs the rename-aside dance for.
- ``identity``         -> the object's (generation, etag) instead of
                          (inode, mtime_ns).
- ``listdir``/``isdir``-> prefix LIST with delimiter '/'.
- ``mtime``            -> the object's Last-Modified.

Everything here is driver-side small-file IO (manifests are KBs), so
per-call HTTP latency is fine; the 100-TB data volume never flows
through this interface.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid


class PosixStorage:
    """Default backend: local / NFS / any mounted filesystem."""

    # -- small-file IO ------------------------------------------------------

    def read_json(self, path: str) -> dict | None:
        """Parse a small JSON file; None when absent."""
        try:
            with open(path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def write_json_atomic(self, path: str, obj: dict) -> None:
        """Readers see the old or the new content, never a torn write
        (tmp file + atomic rename within the same directory)."""
        d, base = os.path.split(path)
        tmp = os.path.join(d, f".{base}.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    # -- layout -------------------------------------------------------------

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path)

    def remove(self, path: str) -> None:
        os.remove(path)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    # -- writer lock primitives --------------------------------------------

    def create_exclusive(self, path: str, data: bytes) -> bool:
        """Create ``path`` with ``data`` iff it does not exist — the
        lock-acquire primitive.  Returns False when it already exists.
        Object stores: conditional put (If-None-Match / generation 0)."""
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, data)
        finally:
            os.close(fd)
        return True

    def identity(self, path: str):
        """Opaque identity+age token for the lock file: compares equal
        only for the same physical object.  Returns (identity, age_mtime)
        or None when absent."""
        try:
            st = os.stat(path)
        except FileNotFoundError:
            return None
        return ((st.st_ino, st.st_mtime_ns), st.st_mtime)

    def take_aside(self, path: str, expected_identity) -> bool:
        """Stale-lock break: atomically move ``path`` out of the way and
        delete it, but ONLY if it is still the object whose identity was
        judged stale.  Returns True when the stale lock is gone (by us
        or a racer), False when a fresh lock now holds the path.

        Posix has no conditional delete, so: rename to a private name —
        exactly one racer wins — then verify identity and undo the
        rename if a fresh lock was caught instead (see Pool docstring
        for the accepted residual window).  Object stores do this in one
        conditional DELETE on generation/ETag."""
        aside = path + f".break-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(path, aside)
        except FileNotFoundError:
            return True  # another waiter broke it first
        st = os.stat(aside)
        if (st.st_ino, st.st_mtime_ns) != expected_identity:
            os.rename(aside, path)  # stole a fresh lock: undo
            return False
        os.remove(aside)
        return True
