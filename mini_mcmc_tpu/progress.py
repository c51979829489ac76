"""Live progress reporting for sampling runs.

TPU-native replacement for the reference's progress system
(/root/reference/src/core.rs:208-360: per-chain worker threads, mpsc
channels, a detached progress thread driving indicatif bars). On TPU all
chains advance in lockstep inside one compiled scan, so per-chain bars are
degenerate (every chain is always at the same step); what remains meaningful
is the reference's *global* bar — percent done, streaming ``p(accept)`` EWMA
and live ``max(R-hat)`` (core.rs:291-299, hmc.rs:270-280).

Implementation: the run is chunked into several compiled scans; between
chunks the tiny tracker summary (two scalars) is fetched to the host and a
single stderr line is refreshed. This replaces mpsc channels with the
device->host transfer at a throttled cadence (the reference throttles to 1 s
worker-side and 250 ms UI-side, core.rs:105, :230).
"""

from __future__ import annotations

import sys
import time
from typing import Callable

import jax
import jax.numpy as jnp

from . import stats as stats_mod

#: minimum seconds between progress line refreshes
_REFRESH_SECONDS = 0.25
#: target number of chunks per run (more chunks = fresher stats, more
#: dispatch overhead)
_TARGET_CHUNKS = 20


def _render(done: int, total: int, p_accept: float, chain_spread,
            max_rhat: float, elapsed: float, stream) -> None:
    width = 30
    frac = done / max(total, 1)
    filled = int(width * frac)
    bar = "#" * filled + "-" * (width - filled)
    lo, hi = chain_spread
    stream.write(
        f"\r[{bar}] {done}/{total} steps "
        f"p(accept)={p_accept:.3f} (chains {lo:.2f}..{hi:.2f}) "
        f"max(rhat)={max_rhat:.3f} {elapsed:.1f}s"
    )
    stream.flush()


def progress_run(
    runner: Callable,
    state,
    key: jax.Array,
    n_collect: int,
    n_discard: int,
    *,
    n_chains: int,
    dim: int,
    stream=None,
):
    """Run ``runner`` in chunks with a live global progress line.

    ``runner`` is a compiled runner from :mod:`mini_mcmc_tpu.runner` taking
    ``(state, key, n_collect, n_discard, tracker)``. Returns
    ``(final_state, sample [C, n_collect, D])``.
    """
    stream = stream if stream is not None else sys.stderr
    total = n_collect + n_discard
    chunk = max(1, total // _TARGET_CHUNKS)

    tracker = stats_mod.tracker_init(n_chains, dim)
    pieces = []
    done = 0
    start = time.monotonic()
    last_render = 0.0

    # Every chunk uses the collect-only signature (chunk, 0) so the whole
    # progress run compiles at most two programs (full chunk + remainder);
    # burn-in rows are simply dropped host-side. Varying (c, d) chunk
    # signatures would recompile the entire sampling scan per combination.
    remaining = n_discard + n_collect
    while remaining > 0:
        c = min(chunk, remaining)
        key, sub = jax.random.split(key)
        state, sample, tracker = runner(state, sub, c, 0, tracker=tracker)
        keep_from = max(0, n_discard - done)
        if keep_from < c:
            pieces.append(sample[:, keep_from:])
        remaining -= c
        done += c

        now = time.monotonic()
        if now - last_render >= _REFRESH_SECONDS or done >= total:
            p_accept = float(tracker.p_accept)
            pc = tracker.p_accept_chains
            spread = (float(jnp.min(pc)), float(jnp.max(pc)))
            max_rhat = float(stats_mod.tracker_max_rhat(tracker))
            _render(done, total, p_accept, spread, max_rhat, now - start,
                    stream)
            last_render = now

    stream.write("\n")
    stream.flush()
    sample = (
        jnp.concatenate(pieces, axis=1)
        if pieces
        else jnp.zeros((n_chains, 0, dim))
    )
    return state, sample
