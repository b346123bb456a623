"""Typed error hierarchy.

Mirrors the reference's error taxonomy (/root/reference/src/errors.ts:1-432)
at the granularity our Spark-first engine needs: validation errors for the
query translators, concurrency/commit errors for the table layer.
"""

from __future__ import annotations


class DeltaError(Exception):
    """Base class for all engine errors."""


class InvalidFilterError(DeltaError):
    """Raised for malformed Mongo-style filter documents.

    Mirrors the reference's filter validation
    (/root/reference/src/delta/table.ts:1847-1893): unknown ``$`` operators
    are rejected with the list of supported ones.
    """


class InvalidPipelineError(DeltaError):
    """Raised for malformed aggregation pipelines / unknown stages."""


class InvalidProjectionError(DeltaError):
    """Raised for mixed inclusion/exclusion or malformed projections."""


class ConcurrencyError(DeltaError):
    """Another writer committed the version we were about to write.

    Mirrors ConcurrencyError on conditional commit-file creation
    (/root/reference/src/delta/table.ts:807-814).
    """

    def __init__(self, table_path: str, version: int):
        super().__init__(
            f"Concurrent update to {table_path}: version {version} already exists"
        )
        self.table_path = table_path
        self.version = version


class TableNotFoundError(DeltaError):
    """No _delta_log found at the given path."""


class VersionNotFoundError(DeltaError):
    """Requested time-travel version does not exist."""


class NoMatchError(DeltaError):
    """DML matched no rows (reference errors on no-op delete,
    /root/reference/src/delta/table.ts:2214-2297)."""


class SchemaMismatchError(DeltaError):
    """Incompatible schema on write without mergeSchema."""
