"""Bounded-retry wrapper for connector fetches.

The reference retries transient metadata-fetch failures with a fixed
attempt budget and an inter-attempt sleep (streamlit_app.py:300-309:
``for attempt in range(retries): try ... except: time.sleep(2)``).
Spark analog: a connector partition read that dies on the FIRST transient
error kills the whole task (and after ``spark.task.maxFailures`` the whole
job) — so the retry belongs INSIDE the partition reader, worker-side,
where it costs one partition's latency instead of a task re-schedule.

Deliberately tiny and dependency-free: connectors wrap only the initial
request/execute in ``call_with_retries`` — once a result stream is open,
mid-stream failures surface to Spark's own task retry, which is the
correct layer for replaying a partially-consumed partition.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


def call_with_retries(
    fn: Callable[[], T],
    retries: int = 2,
    delay: float = 0.1,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
) -> T:
    """Call ``fn`` with up to ``retries`` total attempts (the reference's
    ``range(retries)`` contract); sleep ``delay`` (doubling per attempt)
    between failures; re-raise the last error when the budget is spent."""
    if retries < 1:
        raise ValueError(f"retries must be >= 1, got {retries}")
    for attempt in range(retries):
        try:
            return fn()
        except retry_on:
            if attempt == retries - 1:
                raise
            time.sleep(delay * (2**attempt))
    raise AssertionError("unreachable")
