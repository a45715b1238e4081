"""Statement timing (reference A18).

The reference wall-clocks every statement and rounds to 0.1 s
(``/root/reference/lib/commondb.py:83-89,93-98,103-108,115-124``).
Spark-native: a ``perf_counter`` wrapper for API parity plus a
``QueryExecutionListener``-style hook is unnecessary locally — the
wrapper times the full action including JVM execution.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any


def timed(fn: Callable[..., Any], *args, **kwargs) -> tuple[Any, float]:
    """Run ``fn`` and return (result, elapsed-seconds rounded to 0.1)
    — the reference's ``round(after - init, 1)`` convention."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    return out, round(time.perf_counter() - t0, 1)


class StatementTimer:
    """Accumulates (label, seconds) pairs — the refresh-log analog
    (check_lakehouse.py:152-157) without the side-effect file."""

    def __init__(self) -> None:
        self.entries: list[tuple[str, float]] = []

    def run(self, label: str, fn: Callable[..., Any], *args, **kwargs) -> Any:
        out, secs = timed(fn, *args, **kwargs)
        self.entries.append((label, secs))
        return out
