"""Typed error hierarchy.

Mirrors the reference's error taxonomy (/root/reference/src/errors.ts:1-432)
at the granularity our Spark-first engine needs: validation errors for the
query translators, concurrency/commit errors for the table layer.
"""

from __future__ import annotations

from typing import Any


class DeltaError(Exception):
    """Base class for all engine errors (reference DeltaLakeError,
    src/errors.ts:46-70: stable ``code`` for programmatic handling +
    optional ``cause`` chaining)."""

    code: str = "DELTA_ERROR"

    def __init__(self, message: str = "", *,
                 code: str | None = None, cause: Any = None):
        super().__init__(message)
        if code is not None:
            self.code = code
        self.cause = cause


class StorageError(DeltaError):
    """Storage operation failure (reference StorageError,
    src/errors.ts:82-96: carries the path and the failed operation)."""

    code = "STORAGE_ERROR"

    def __init__(self, message: str, path: str, operation: str = "read",
                 *, code: str | None = None, cause: Any = None):
        super().__init__(message, code=code, cause=cause)
        self.path = path
        self.operation = operation


class DeltaFileNotFoundError(StorageError):
    """Missing file (reference FileNotFoundError, src/errors.ts:102-108;
    renamed to avoid shadowing the Python builtin)."""

    code = "FILE_NOT_FOUND"

    def __init__(self, path: str, operation: str = "read"):
        super().__init__(f"File not found: {path}", path, operation)


class VersionMismatchError(StorageError):
    """Conditional write lost to another writer (reference
    VersionMismatchError, src/errors.ts:128-152). Retryable after
    re-reading the current version."""

    code = "VERSION_MISMATCH"
    retryable = True

    def __init__(self, path: str, expected: Any, actual: Any):
        super().__init__(
            f"Version mismatch on {path}: expected {expected}, "
            f"found {actual}", path, "write")
        self.expected_version = expected
        self.actual_version = actual


class CDCError(DeltaError):
    """Change-data-capture subsystem failure (reference CDCError,
    src/errors.ts:291-320)."""

    code = "CDC_ERROR"


class ValidationError(DeltaError):
    """Invalid input value (reference ValidationError,
    src/errors.ts:326-341: optionally names the offending field/value)."""

    code = "VALIDATION_ERROR"

    def __init__(self, message: str, field: str | None = None,
                 value: Any = None):
        super().__init__(message)
        self.field = field
        self.value = value


class AbortError(DeltaError):
    """Operation cancelled via an abort signal (reference AbortError,
    src/delta/retry.ts:140-149)."""

    code = "ABORTED"

    def __init__(self, message: str = "Operation was aborted"):
        super().__init__(message)


class InvalidFilterError(ValidationError):
    """Raised for malformed Mongo-style filter documents.

    Mirrors the reference's filter validation
    (/root/reference/src/delta/table.ts:1847-1893): unknown ``$`` operators
    are rejected with the list of supported ones.
    """

    code = "INVALID_FILTER"


class InvalidPipelineError(ValidationError):
    """Raised for malformed aggregation pipelines / unknown stages."""

    code = "INVALID_PIPELINE"


class InvalidProjectionError(ValidationError):
    """Raised for mixed inclusion/exclusion or malformed projections."""

    code = "INVALID_PROJECTION"


class ConcurrencyError(DeltaError):
    """Another writer committed the version we were about to write.

    Mirrors ConcurrencyError on conditional commit-file creation
    (/root/reference/src/delta/table.ts:807-814; retryable flag
    src/errors.ts:210-244).
    """

    code = "CONCURRENT_UPDATE"
    retryable = True

    def __init__(self, table_path: str, version: int):
        super().__init__(
            f"Concurrent update to {table_path}: version {version} already exists"
        )
        self.table_path = table_path
        self.version = version


class TableNotFoundError(DeltaError):
    """No _delta_log found at the given path."""

    code = "TABLE_NOT_FOUND"


class VersionNotFoundError(DeltaError):
    """Requested time-travel version does not exist."""

    code = "VERSION_NOT_FOUND"


class NoMatchError(DeltaError):
    """DML matched no rows (reference errors on no-op delete,
    /root/reference/src/delta/table.ts:2214-2297)."""

    code = "NO_MATCH"


class SchemaMismatchError(DeltaError):
    """Incompatible schema on write without mergeSchema."""

    code = "SCHEMA_MISMATCH"


class UnsupportedProtocolError(DeltaError):
    """Table's `protocol` action demands reader/writer versions beyond
    what this engine implements — refusing beats a silently incorrect
    read or a table-corrupting write."""

    code = "PROTOCOL_UNSUPPORTED"


class ConstraintViolationError(ValidationError):
    """Incoming or existing rows violate a CHECK constraint
    (``delta.constraints.<name>`` table property). Carries the violation
    counts per constraint name."""

    code = "CONSTRAINT_VIOLATION"

    def __init__(self, message: str,
                 violations: dict[str, int] | None = None):
        super().__init__(message)
        self.violations = dict(violations or {})


# ---------------------------------------------------------------------------
# type guards (reference errors.ts:393-432)
# ---------------------------------------------------------------------------

def has_retryable_property(error: BaseException) -> bool:
    """True when the error declares its own retryability
    (reference hasRetryableProperty, errors.ts:397-399)."""
    return isinstance(getattr(error, "retryable", None), bool)


def is_retryable(error: BaseException) -> bool:
    """ConcurrencyError and anything flagged ``retryable = True``
    (reference isRetryableError, errors.ts:402-413)."""
    if isinstance(error, ConcurrencyError):
        return True
    return has_retryable_property(error) and error.retryable is True


def is_delta_error(error: BaseException) -> bool:
    return isinstance(error, DeltaError)


def is_storage_error(error: BaseException) -> bool:
    return isinstance(error, StorageError)


def is_concurrency_error(error: BaseException) -> bool:
    return isinstance(error, ConcurrencyError)


def is_validation_error(error: BaseException) -> bool:
    return isinstance(error, ValidationError)
