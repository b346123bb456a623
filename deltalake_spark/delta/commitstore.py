"""Pluggable conditional-write primitive for Delta log commits.

The OCC guarantee of the whole engine reduces to ONE primitive: create
``<v>.json`` only if it does not already exist (the reference abstracts
this as ``writeConditional(path, data, expectedVersion=None)``,
src/storage/types.ts:208; its FileSystem/R2/S3 backends implement it
with mtime/ETag preconditions). ``delta/log.py`` routes every commit
through the installed :class:`CommitStore`, so a deployment whose
filesystem lacks atomic create-if-absent (plain S3 without
If-None-Match, some NFS mounts) plugs in a store that maps the
condition onto what the backend offers:

* S3 (2024+): ``PutObject`` with ``If-None-Match: *`` — a 412 response
  is a lost race -> raise :class:`CommitConflictError`.
* GCS: ``x-goog-if-generation-match: 0``.
* Older S3: an external coordinator (DynamoDB-style log store) owns the
  put-if-absent; the store calls it and translates its conflict.

The default :class:`LocalCommitStore` uses ``O_CREAT | O_EXCL`` +
``fsync`` — atomic on POSIX filesystems and HDFS-style mounts.
"""

from __future__ import annotations

import os
import threading
from typing import Callable


class CommitConflictError(Exception):
    """Another writer created the path first (lost the OCC race)."""


class CommitStore:
    """Conditional-write seam. Subclasses implement
    :meth:`write_if_absent`; everything else in the engine is
    backend-agnostic."""

    def write_if_absent(self, path: str, payload: bytes) -> None:
        """Atomically create ``path`` with ``payload``. MUST raise
        :class:`CommitConflictError` if the path already exists, and
        MUST NOT leave partial content visible on failure."""
        raise NotImplementedError


class LocalCommitStore(CommitStore):
    """POSIX create-if-absent: ``open(O_CREAT | O_EXCL)`` is atomic on
    local filesystems; ``fsync`` makes the commit durable before it
    becomes the newest log entry."""

    def write_if_absent(self, path: str, payload: bytes) -> None:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CommitConflictError(path) from None
        try:
            os.write(fd, payload)
            os.fsync(fd)
        finally:
            os.close(fd)


class ConditionalPutCommitStore(CommitStore):
    """Object-store shape: an injected ``put(path, payload) -> bool``
    models a conditional PUT (returns False on precondition failure,
    e.g. HTTP 412 from ``If-None-Match: *``). Used by tests to inject
    races; a real S3/GCS adapter has exactly this surface."""

    def __init__(self, put: "Callable[[str, bytes], bool]") -> None:
        self._put = put

    def write_if_absent(self, path: str, payload: bytes) -> None:
        if not self._put(path, payload):
            raise CommitConflictError(path)


_lock = threading.Lock()
_store: CommitStore = LocalCommitStore()


def get_commit_store() -> CommitStore:
    return _store


def set_commit_store(store: "CommitStore | None") -> CommitStore:
    """Install a store (None restores the local default); returns the
    previous one so callers can scope the swap."""
    global _store
    with _lock:
        prev = _store
        _store = store if store is not None else LocalCommitStore()
        return prev
