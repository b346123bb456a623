"""Retry with exponential backoff for concurrency conflicts.

Mirrors the reference's withRetry (/root/reference/src/delta/retry.ts:
243-401, config 77-135, metrics 55-72, AbortError 140-149): exponential
backoff + jitter, per-error retryability (class allowlist, a
``retryable`` attribute convention, or a custom predicate), retry/
success/failure callbacks, collected :class:`RetryMetrics`, and
cooperative cancellation via a ``threading.Event`` abort signal (the
Python analog of the reference's ``AbortSignal``).

Used to wrap optimistic commits — on ConcurrencyError the caller
re-reads the snapshot and replays.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass, field
from typing import Callable, TypeVar

from deltalake_spark.errors import AbortError, ConcurrencyError, is_retryable

T = TypeVar("T")


@dataclass
class RetryConfig:
    max_attempts: int = 5
    initial_delay: float = 0.05     # seconds
    max_delay: float = 2.0
    multiplier: float = 2.0
    jitter: float = 0.2             # +/- fraction of the delay


@dataclass
class RetryMetrics:
    """Execution metrics (reference RetryMetrics, retry.ts:55-72)."""
    attempts: int = 0
    retries: int = 0
    succeeded: bool = False
    total_delay_s: float = 0.0
    elapsed_s: float = 0.0
    delays: list[float] = field(default_factory=list)
    errors: list[BaseException] = field(default_factory=list)


def with_retry(
    fn: Callable[[], T],
    config: RetryConfig | None = None,
    *,
    retryable: tuple[type[BaseException], ...] = (ConcurrencyError,),
    is_retryable_fn: Callable[[BaseException], bool] | None = None,
    on_retry: Callable[[int, BaseException], object] | None = None,
    on_success: Callable[[T, int], None] | None = None,
    on_failure: Callable[[BaseException, int], None] | None = None,
    abort_signal: "object | None" = None,
    return_metrics: bool = False,
    metrics: RetryMetrics | None = None,
) -> T | tuple[T, RetryMetrics]:
    """Run ``fn``, retrying retryable errors with exponential backoff.

    ``fn`` must re-read table state itself on each attempt (commits are
    version-bound; a retried write recomputes its target version).

    An error retries when it is an instance of ``retryable``, carries a
    truthy ``retryable`` attribute, or ``is_retryable_fn`` returns True
    (reference isRetryableError, errors.ts:402-413). ``on_retry`` may
    return ``False`` to abort further retries; ``abort_signal`` is any
    object with ``is_set()`` (e.g. ``threading.Event``) — once set, the
    next attempt/sleep raises :class:`AbortError` (reference
    signal handling, retry.ts:330-360). With ``return_metrics`` the
    result is ``(value, RetryMetrics)``.
    """
    cfg = config or RetryConfig()
    m = metrics if metrics is not None else RetryMetrics()
    t_start = time.perf_counter()

    def _aborted() -> bool:
        return abort_signal is not None and abort_signal.is_set()

    def _should_retry(e: BaseException) -> bool:
        if isinstance(e, retryable):
            return True
        if is_retryable_fn is not None and is_retryable_fn(e):
            return True
        return is_retryable(e)

    def _finish_fail(e: BaseException) -> None:
        m.elapsed_s = time.perf_counter() - t_start
        if on_failure:
            on_failure(e, m.attempts)

    delay = cfg.initial_delay
    for attempt in range(1, cfg.max_attempts + 1):
        if _aborted():
            e: BaseException = AbortError()
            _finish_fail(e)
            raise e
        try:
            result = fn()
        except BaseException as e:
            m.attempts = attempt
            m.errors.append(e)
            if (not _should_retry(e)) or attempt == cfg.max_attempts:
                _finish_fail(e)
                raise
            if on_retry is not None and on_retry(attempt, e) is False:
                _finish_fail(e)
                raise
            jitter = delay * cfg.jitter * (2 * random.random() - 1)
            sleep_s = min(cfg.max_delay, max(0.0, delay + jitter))
            m.retries += 1
            m.delays.append(sleep_s)
            m.total_delay_s += sleep_s
            time.sleep(sleep_s)
            delay = min(cfg.max_delay, delay * cfg.multiplier)
            continue
        m.attempts = attempt
        m.succeeded = True
        m.elapsed_s = time.perf_counter() - t_start
        if on_success:
            on_success(result, attempt)
        return (result, m) if return_metrics else result
    raise AssertionError("unreachable")
