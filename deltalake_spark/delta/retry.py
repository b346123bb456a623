"""Retry with exponential backoff for concurrency conflicts.

Mirrors the reference's withRetry (/root/reference/src/delta/retry.ts:
243-401, config 77-135): exponential backoff + jitter, retryable-error
filter, max-attempt cap. Used to wrap optimistic commits — on
ConcurrencyError the caller re-reads the snapshot and replays.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass
from typing import Callable, TypeVar

from deltalake_spark.errors import ConcurrencyError

T = TypeVar("T")


@dataclass
class RetryConfig:
    max_attempts: int = 5
    initial_delay: float = 0.05     # seconds
    max_delay: float = 2.0
    multiplier: float = 2.0
    jitter: float = 0.2             # +/- fraction of the delay


def with_retry(
    fn: Callable[[], T],
    config: RetryConfig | None = None,
    *,
    retryable: tuple[type[BaseException], ...] = (ConcurrencyError,),
    on_retry: Callable[[int, BaseException], None] | None = None,
) -> T:
    """Run ``fn``, retrying retryable errors with exponential backoff.

    ``fn`` must re-read table state itself on each attempt (commits are
    version-bound; a retried write recomputes its target version).
    """
    cfg = config or RetryConfig()
    delay = cfg.initial_delay
    for attempt in range(1, cfg.max_attempts + 1):
        try:
            return fn()
        except retryable as e:
            if attempt == cfg.max_attempts:
                raise
            if on_retry:
                on_retry(attempt, e)
            jitter = delay * cfg.jitter * (2 * random.random() - 1)
            time.sleep(min(cfg.max_delay, max(0.0, delay + jitter)))
            delay = min(cfg.max_delay, delay * cfg.multiplier)
    raise AssertionError("unreachable")
