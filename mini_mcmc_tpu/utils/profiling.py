"""Profiling helpers.

The reference's tracing surface is the wall-clock ``Timer``
(/root/reference/src/dev_tools.rs); the TPU-native equivalents are XLA
profiler traces (tensorboard-compatible) plus step timers that understand
async dispatch.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mini_mcmc_tpu_trace"):
    """Capture a ``jax.profiler`` trace around a block.

    View with TensorBoard (or xprof) pointed at ``log_dir``.

        with profiling.trace("/tmp/trace"):
            sampler.run(1000, 100)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sync(x):
    """Force ``x`` to full completion and return it (async/remote safe).

    ``block_until_ready`` can return early on tunneled backends; a scalar
    fetch of ONE element defeats that. Never ravel/copy the array to fetch:
    a tiled device copy pads the minor dim to the 128-lane register width —
    a ``[C, N, 3]`` f32 cube becomes a 42x larger allocation and OOMs HBM.
    """
    import jax.numpy as jnp

    x = jnp.asarray(x)
    jax.block_until_ready(x)
    _ = float(x[tuple(d - 1 for d in x.shape)])
    return x


def step_timer(fn, *args, repeats: int = 3, **kwargs):
    """Median wall-clock of ``fn(*args, **kwargs)`` with full completion
    forced (async/remote dispatch safe). Returns ``(result, seconds)``."""
    times = []
    result = None
    for _ in range(repeats):
        t0 = time.monotonic()
        result = fn(*args, **kwargs)
        result = jax.block_until_ready(result)
        # indexed scalar fetch defeats early-returning block_until_ready
        # on tunneled backends; never ravel (see sync() — a tiled copy of
        # a big cube pads the minor dim 42x and can OOM HBM)
        leaf = jax.tree_util.tree_leaves(result)[0]
        _ = float(leaf[tuple(d - 1 for d in leaf.shape)])
        times.append(time.monotonic() - t0)
    times.sort()
    return result, times[len(times) // 2]
