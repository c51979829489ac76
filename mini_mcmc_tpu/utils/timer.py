"""Wall-clock timer for benchmarks.

Port of ``dev_tools::Timer`` (/root/reference/src/dev_tools.rs:9-39):
``log(msg)`` prints the elapsed time since the previous call. Extended with
``block_until_ready``-aware timing helpers for async JAX dispatch.
"""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self._last = time.monotonic()

    def log(self, msg: str) -> float:
        """Print and return seconds elapsed since the last call."""
        now = time.monotonic()
        elapsed = now - self._last
        self._last = now
        print(f"[timer] {msg}: {elapsed * 1000.0:.3f} ms")
        return elapsed

    def reset(self) -> None:
        self._last = time.monotonic()


def time_blocked(fn, *args, **kwargs):
    """Time ``fn(*args, **kwargs)``, blocking on the result (async dispatch
    safe). Returns ``(result, seconds)``."""
    import jax

    start = time.monotonic()
    result = fn(*args, **kwargs)
    result = jax.block_until_ready(result)
    return result, time.monotonic() - start
