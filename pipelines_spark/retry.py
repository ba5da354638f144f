"""Retry policy for flaky external calls (sources, geocoders, model
fetches).

Reference contract: Prefect task retries 5 × 10 s
(pipelines/constants.py:74-75), SMTR 3 × 10 s
(pipelines/rj_smtr/constants.py:22-23), DB query retry 10× with
reconnect (pipelines/rj_smtr/utils.py:809-828). Spark already retries
*tasks* inside a job; this helper covers the driver-side boundary
calls Spark can't retry for us — the fetch that produces the
DataFrame, not the DataFrame computation.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


def with_retries(
    fn: Callable[[], T],
    *,
    attempts: int = 5,
    delay_s: float = 10.0,
    backoff: float = 1.0,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[int, BaseException], None] | None = None,
) -> T:
    """Call ``fn`` up to ``attempts`` times; sleep ``delay_s`` (times
    ``backoff`` per attempt) between tries; re-raise the last error.

    ``sleep`` and ``on_retry`` are injectable for tests and logging.
    """
    delay = delay_s
    last: BaseException | None = None
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except retry_on as exc:  # noqa: PERF203 — retry loop by design
            last = exc
            if attempt == attempts:
                break
            if on_retry:
                on_retry(attempt, exc)
            sleep(delay)
            delay *= backoff
    assert last is not None
    raise last
