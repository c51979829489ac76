"""Streaming and final MCMC diagnostics.

Behavioral port of ``/root/reference/src/stats.rs`` to batched JAX:

- ``MultiChainTracker`` (stats.rs:189-307) -> :class:`TrackerState` pytree
  updated on-device inside the sampling scan.
- ``collect_rhat``/``withinvar_from_cs`` (stats.rs:150-178) -> live R-hat
  from streaming moments.
- ``split_rhat_mean_ess`` (stats.rs:416-546) -> split chains, within/between
  variances, Stan-style rho_t with Geyer initial-monotone pairwise sums.
- ``autocov`` (stats.rs:548-654) -> brute force for n <= 100, batched FFT
  otherwise (``jnp.fft`` over all chain/parameter sequences at once; the
  reference Rayon-parallelizes per parameter, stats.rs:588-590).

Formula quirks preserved on purpose (parity targets):

- The *final* split R-hat is ``sqrt(W / var)`` (stats.rs:425-427) — the
  inverse of the tracker's live ``sqrt(var / W)`` (stats.rs:152, :284).
- The tracker's acceptance probability is an EWMA (alpha = 0.01) of the
  "state changed" indicator folded sequentially across chains within a step
  (stats.rs:13, :250-255).
- ``collect_rhat``'s between-chain variance divides by
  ``n_chains * n_params - 1`` (``diffs.len() - 1``, stats.rs:173).

All heavy computation is float32, matching the reference (stats.rs uses f32
throughout).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA = 0.01  # EWMA coefficient for acceptance tracking (stats.rs:13)


# ---------------------------------------------------------------------------
# Streaming trackers (on-device, carried through the sampling scan)
# ---------------------------------------------------------------------------


class TrackerState(NamedTuple):
    """Running moments for all chains: ``MultiChainTracker`` as a pytree.

    Fields mirror /root/reference/src/stats.rs:189-197 with shapes
    ``[n_chains, n_params]``, plus a per-chain acceptance EWMA giving the
    per-chain ``ChainTracker`` surface (stats.rs:26-141) in the same
    batched state (the lockstep analog of the reference's per-chain
    progress bars).
    """

    n: jax.Array  # scalar int32, number of steps seen
    p_accept: jax.Array  # scalar f32 EWMA acceptance probability
    last_state: jax.Array  # [C, P] f32
    mean: jax.Array  # [C, P] f32
    mean_sq: jax.Array  # [C, P] f32
    #: [C] per-chain EWMA acceptance; -1 sentinel before the first step
    #: (ChainTracker semantics, stats.rs:110-116)
    p_accept_chains: jax.Array


def tracker_init(n_chains: int, n_params: int, initial_state=None) -> TrackerState:
    """Fresh tracker; ``initial_state`` seeds ``last_state`` (zeros in the
    reference's MultiChainTracker, stats.rs:208-219)."""
    shape = (n_chains, n_params)
    last = (
        jnp.zeros(shape, jnp.float32)
        if initial_state is None
        else jnp.asarray(initial_state, jnp.float32)
    )
    return TrackerState(
        n=jnp.zeros((), jnp.int32),
        p_accept=jnp.zeros((), jnp.float32),
        last_state=last,
        mean=jnp.zeros(shape, jnp.float32),
        mean_sq=jnp.zeros(shape, jnp.float32),
        p_accept_chains=jnp.full((n_chains,), -1.0, jnp.float32),
    )


def tracker_update(
    tracker: TrackerState, positions: jax.Array
) -> TrackerState:
    """One streaming update (stats.rs:228-259).

    The reference folds the acceptance EWMA sequentially over chain rows
    within the step; the closed form uses weights
    ``alpha * (1-alpha)^(C-1-i)`` plus ``(1-alpha)^C`` on the old value.
    """
    positions = positions.astype(jnp.float32)
    if positions.ndim == 1:
        positions = positions[:, None]
    n_chains = positions.shape[0]
    n = (tracker.n + 1).astype(jnp.float32)

    mean = (tracker.mean * (n - 1.0) + positions) / n
    mean_sq = (tracker.mean_sq * (n - 1.0) + positions * positions) / n

    accepted = jnp.any(  # [C]
        positions != tracker.last_state, axis=1
    ).astype(jnp.float32)
    decay = (1.0 - ALPHA) ** jnp.arange(n_chains - 1, -1, -1, dtype=jnp.float32)
    p_accept = tracker.p_accept * (1.0 - ALPHA) ** n_chains + ALPHA * jnp.sum(
        decay * accepted
    )
    # per-chain EWMA with the ChainTracker first-step convention
    # (stats.rs:110-116): the seed value compares only coordinate 0.
    fresh = tracker.p_accept_chains < 0.0
    accepted_coord0 = (
        positions[:, 0] != tracker.last_state[:, 0]
    ).astype(jnp.float32)
    base = jnp.where(fresh, accepted_coord0, tracker.p_accept_chains)
    p_accept_chains = (1.0 - ALPHA) * base + ALPHA * accepted

    return TrackerState(
        n=tracker.n + 1,
        p_accept=p_accept,
        last_state=positions,
        mean=mean,
        mean_sq=mean_sq,
        p_accept_chains=p_accept_chains,
    )


class ChainStats(NamedTuple):
    """Snapshot of per-chain streaming statistics (stats.rs:43-48)."""

    n: jax.Array
    p_accept: jax.Array
    mean: jax.Array  # [P] or [C, P]
    sm2: jax.Array  # [P] or [C, P]


def tracker_stats(tracker: TrackerState) -> ChainStats:
    """Bias-corrected snapshot: ``sm2 = (mean_sq - mean^2) * n/(n-1)``
    (stats.rs:132-140, :300)."""
    n = tracker.n.astype(jnp.float32)
    sm2 = (tracker.mean_sq - tracker.mean**2) * n / (n - 1.0)
    return ChainStats(
        n=tracker.n, p_accept=tracker.p_accept, mean=tracker.mean, sm2=sm2
    )


def tracker_rhat(tracker: TrackerState) -> jax.Array:
    """Live per-parameter R-hat from streaming moments
    (``MultiChainTracker::rhat``, stats.rs:282-306): ``sqrt(var / W)``."""
    n_chains = tracker.mean.shape[0]
    n = tracker.n.astype(jnp.float32)
    mean_chain = jnp.mean(tracker.mean, axis=0)  # [P]
    fac = n / (n_chains - 1.0)
    between = jnp.sum((tracker.mean - mean_chain[None, :]) ** 2, axis=0) * fac
    sm2 = (tracker.mean_sq - tracker.mean**2) * n / (n - 1.0)
    within = jnp.mean(sm2, axis=0)
    var = within * ((n - 1.0) / n) + between * (1.0 / n)
    return jnp.sqrt(var / within)


def tracker_max_rhat(tracker: TrackerState) -> jax.Array:
    return jnp.max(tracker_rhat(tracker))


class ChainTracker:
    """Single-chain streaming tracker: the per-chain ``ChainTracker``
    surface (stats.rs:26-141) as a thin stateful wrapper over the batched
    :class:`TrackerState` with ``n_chains == 1``.

    Example:
        >>> t = ChainTracker(2, [0.0, 0.0])
        >>> t.step([1.0, 2.0])
        >>> cs = t.stats()  # ChainStats(n, p_accept, mean, sm2)
    """

    def __init__(self, n_params: int, initial_state=None):
        init = (
            None
            if initial_state is None
            else jnp.asarray(initial_state, jnp.float32)[None, :]
        )
        self._state = tracker_init(1, n_params, init)

    def step(self, x) -> None:
        self._state = tracker_update(
            self._state, jnp.asarray(x, jnp.float32)[None, :]
        )

    def stats(self) -> ChainStats:
        cs = tracker_stats(self._state)
        return ChainStats(
            n=cs.n,
            p_accept=self._state.p_accept_chains[0],
            mean=cs.mean[0],
            sm2=cs.sm2[0],
        )


def _withinvar_from_cs(means, sm2s, ns):
    """Within-chain variance and pooled variance from live per-chain stats
    (``withinvar_from_cs``, stats.rs:155-178). Preserves the reference's
    ``diffs.len() - 1`` (= C*P - 1) between-chain divisor (stats.rs:173)."""
    means = jnp.asarray(means, jnp.float32)
    sm2s = jnp.asarray(sm2s, jnp.float32)
    within = jnp.mean(sm2s, axis=0)
    global_means = jnp.mean(means, axis=0)
    diffs = means - global_means[None, :]
    between = jnp.sum(diffs**2, axis=0) / (diffs.size - 1)
    n = jnp.mean(jnp.asarray(ns, jnp.float32))
    var = between + within * ((n - 1.0) / n)
    return within, var


def collect_rhat(means: jax.Array, sm2s: jax.Array, ns: jax.Array) -> jax.Array:
    """Live R-hat from per-chain ``ChainStats`` (stats.rs:150-178).

    Args:
        means: ``[C, P]`` per-chain running means.
        sm2s: ``[C, P]`` per-chain bias-corrected second moments.
        ns: ``[C]`` per-chain step counts.
    """
    within, var = _withinvar_from_cs(means, sm2s, ns)
    return jnp.sqrt(var / within)


# ---------------------------------------------------------------------------
# Autocovariance (stats.rs:548-654)
# ---------------------------------------------------------------------------


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@partial(jax.jit, static_argnames=())
def autocov_fft(sample: jax.Array) -> jax.Array:
    """FFT autocovariance of each column of an ``[n, d]`` array -> ``[n, d]``.

    Zero-pads to the next power of two >= 2n-1 (stats.rs:580-584); biased
    normalization ``1/n``. Batched over columns in one ``jnp.fft`` call.
    """
    sample = jnp.asarray(sample, jnp.float32)
    n = sample.shape[0]
    n_padded = _next_pow2(max(2 * n - 1, 1))
    x = sample - jnp.mean(sample, axis=0, keepdims=True)
    f = jnp.fft.rfft(x, n=n_padded, axis=0)
    acov = jnp.fft.irfft(jnp.abs(f) ** 2, n=n_padded, axis=0)[:n]
    return acov / n


@partial(jax.jit, static_argnames=())
def autocov_bf(sample: jax.Array) -> jax.Array:
    """Brute-force autocovariance (stats.rs:632-654), used for n <= 100.

    ``out[lag, d] = sum_t x[t, d] * x[t+lag, d] / n`` on mean-subtracted x.
    Scanned over lags with O(n * d) scratch (the reference's memory profile,
    stats.rs:644-651) — no [n, n, d] intermediate, which matters once this
    runs vmapped across thousands of split chains.
    """
    sample = jnp.asarray(sample, jnp.float32)
    n = sample.shape[0]
    x = sample - jnp.mean(sample, axis=0, keepdims=True)
    x_pad = jnp.concatenate([x, jnp.zeros_like(x)], axis=0)  # [2n, d]

    def per_lag(_, lag):
        shifted = jax.lax.dynamic_slice_in_dim(x_pad, lag, n, axis=0)
        return None, jnp.sum(x * shifted, axis=0) / n

    _, out = jax.lax.scan(per_lag, None, jnp.arange(n))
    return out


def autocov(sample: jax.Array) -> jax.Array:
    """Dispatch: brute force for n <= 100, FFT beyond (stats.rs:548-554)."""
    if sample.shape[0] <= 100:
        return autocov_bf(sample)
    return autocov_fft(sample)


# ---------------------------------------------------------------------------
# Split R-hat + ESS (stats.rs:394-546)
# ---------------------------------------------------------------------------


def _splitcat(sample: jax.Array) -> jax.Array:
    """(C, n, P) -> (2C, n//2, P): first and last halves of each chain
    (stats.rs:396-402; the middle element is dropped when n is odd)."""
    n = sample.shape[1]
    half = n // 2
    return jnp.concatenate([sample[:, :half], sample[:, n - half :]], axis=0)


def _bwv_from_moments(chain_means: jax.Array, squares: jax.Array, nf: float):
    """W and pooled var from per-(split-)chain moments — the SINGLE copy of
    the reference formula (stats.rs:429-477), shared by the chain-major and
    time-major layouts (CLAUDE.md: these are bit-for-bit parity targets).

    Args:
        chain_means: ``[2C, P]`` per-split-chain means.
        squares: ``[2C, P]`` per-split-chain biased variances.
        nf: split-chain length n' as a float — float division throughout:
            with a degenerate split (n' == 0, e.g. a single-draw sample)
            the reference's f64 arithmetic yields NaN/inf rather than
            panicking, while Python int division would raise instead.
    """
    c = chain_means.shape[0]
    overall_mean = jnp.mean(chain_means, axis=0)  # [P]
    diff = chain_means - overall_mean[None, :]
    b = jnp.sum(diff**2, axis=0) * (nf / (c - 1.0))
    w = jnp.mean(squares, axis=0)
    v = ((nf - 1.0) / nf) * w + b / nf if nf > 0 else w * jnp.nan
    return w, v


def _withinvar(splitted: jax.Array):
    """Within-chain variance W and pooled var estimate per parameter
    (stats.rs:429-477). Input ``[2C, n', P]``."""
    chain_means = jnp.mean(splitted, axis=1)  # [2C, P]
    squares = jnp.mean(
        (splitted - chain_means[:, None, :]) ** 2, axis=1
    )  # [2C, P] biased per-chain variance
    return _bwv_from_moments(chain_means, squares, float(splitted.shape[1]))


def _geyer_tau(rho: jax.Array) -> jax.Array:
    """Geyer initial-monotone pairwise sum (stats.rs:518-543).

    ``rho``: ``[n, P]``. Pairs ``P_t = rho[2t] + rho[2t+1]``; accumulate the
    running minimum of pair sums while they stay positive;
    ``tau = -1 + 2 * sum``.
    """
    n = rho.shape[0]
    n_pairs = n // 2
    if n_pairs == 0:
        return jnp.full(rho.shape[1:], -1.0, rho.dtype)
    pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2, -1).sum(axis=1)  # [T, P]
    positive = pairs > 0.0
    valid = jnp.cumprod(positive.astype(rho.dtype), axis=0)
    running_min = jax.lax.associative_scan(jnp.minimum, pairs, axis=0)
    out = jnp.sum(valid * running_min, axis=0)
    return -1.0 + 2.0 * out


#: chains per autocovariance batch: bounds the FFT scratch (complex spectra
#: are ~4x the input) so huge-chain-count diagnostics don't OOM HBM — only
#: the chain-MEAN of the autocovariances is ever needed downstream.
_AUTOCOV_CHUNK = 8192


def _ess(splitted: jax.Array, within: jax.Array, var: jax.Array) -> jax.Array:
    """ESS per parameter (stats.rs:496-546). Input ``[2C, n', P]``."""
    n_chains, n_steps = splitted.shape[0], splitted.shape[1]
    acov = autocov_bf if n_steps <= 100 else autocov_fft
    if n_chains <= _AUTOCOV_CHUNK:
        avg_rho = jnp.mean(jax.vmap(acov)(splitted), axis=0)  # [n', P]
    else:
        # accumulate the chain-sum chunk-by-chunk: a [2C, n_pad, P] complex
        # spectrum for 2C in the tens of thousands is multiple GB
        acc = jnp.zeros(splitted.shape[1:], jnp.float32)
        for i in range(0, n_chains, _AUTOCOV_CHUNK):
            acc = acc + jnp.sum(
                jax.vmap(acov)(splitted[i : i + _AUTOCOV_CHUNK]), axis=0
            )
        avg_rho = acc / n_chains
    rho = 1.0 - (within[None, :] - avg_rho) / var[None, :]
    tau = _geyer_tau(rho)
    return (n_chains * n_steps) / tau


@partial(jax.jit, static_argnames=())
def _tm_moments(sample: jax.Array):
    """Split moments of a time-major ``[N, C, P]`` cube -> (rhat, W, var).

    Jitted so the half-cube slices and their reductions FUSE: XLA reads
    the input cube in place and emits only ``[C, P]``-sized outputs —
    eager dispatch would materialize two half-cube temporaries per moment
    (exactly the allocation the time-major path exists to avoid).
    """
    n = sample.shape[0]
    half = n // 2
    first = sample[:half]  # [n', C, P]
    last = sample[n - half:]
    cm_first = jnp.mean(first, axis=0)  # [C, P]
    cm_last = jnp.mean(last, axis=0)
    chain_means = jnp.concatenate([cm_first, cm_last], axis=0)  # [2C, P]
    squares = jnp.concatenate(
        [
            jnp.mean((first - cm_first[None]) ** 2, axis=0),
            jnp.mean((last - cm_last[None]) ** 2, axis=0),
        ],
        axis=0,
    )  # [2C, P]
    within, var = _bwv_from_moments(chain_means, squares, float(half))
    return jnp.sqrt(within / var), within, var


def _split_rhat_mean_ess_tm(sample: jax.Array):
    """Time-major (``[N, C, P]``) variant of :func:`split_rhat_mean_ess`.

    Memory-lean by construction: the split moments run as one jitted
    program whose half-cube slices fuse into their reductions (only
    ``[2C, P]`` moment rows materialize), and the per-chain autocovariance
    slices + transposes one ``_AUTOCOV_CHUNK``-sized chain block of the
    cube at a time — peak memory is one sample cube plus a chunk, instead
    of the chain-major path's two cubes (its ``_splitcat`` copy). Formulas
    are shared with the chain-major path (``_bwv_from_moments``,
    stats.rs:416-546); results match it to float32 reduction-order noise.
    """
    n = sample.shape[0]
    half = n // 2
    rhat, within, var = _tm_moments(sample)

    # chain-mean autocovariance, chunked over chains (stats.rs:496-546);
    # slice the cube directly per chunk — materializing the half cubes
    # up front would defeat the one-cube peak
    n_chains_total = 2 * sample.shape[1]
    acov = autocov_bf if half <= 100 else autocov_fft
    acc = jnp.zeros((half,) + sample.shape[2:], jnp.float32)
    step = max(1, _AUTOCOV_CHUNK // 2)
    for i in range(0, sample.shape[1], step):
        for lo in (0, n - half):
            blk = jnp.swapaxes(
                sample[lo : lo + half, i : i + step], 0, 1
            )  # [c, n', P]
            acc = acc + jnp.sum(jax.vmap(acov)(blk), axis=0)
    avg_rho = acc / n_chains_total
    rho = 1.0 - (within[None, :] - avg_rho) / var[None, :]
    ess = (n_chains_total * half) / _geyer_tau(rho)
    return rhat, ess


def split_rhat_mean_ess(sample: jax.Array, *, time_major: bool = False):
    """Split R-hat and ESS per parameter following Stan's methodology
    (stats.rs:416-423).

    Args:
        sample: ``[chains, observations, parameters]`` — or
            ``[observations, chains, parameters]`` with ``time_major=True``
            (the runners' pre-transpose layout; halves the peak HBM
            footprint of post-run diagnostics at huge chain counts).

    Returns:
        ``(rhat [P], ess [P])``. Note the reference's split R-hat is
        ``sqrt(W / var)`` (stats.rs:425-427), preserved here.
    """
    sample = jnp.asarray(sample, jnp.float32)
    if time_major:
        return _split_rhat_mean_ess_tm(sample)
    splitted = _splitcat(sample)
    within, var = _withinvar(splitted)
    rhat = jnp.sqrt(within / var)
    ess = _ess(splitted, within, var)
    return rhat, ess


def ess_from_chainstats(sample: jax.Array, means, sm2s, ns) -> jax.Array:
    """ESS from live streaming stats without splitting (stats.rs:668-671)."""
    sample = jnp.asarray(sample, jnp.float32)
    within, var = _withinvar_from_cs(means, sm2s, ns)
    return _ess(sample, within, var)


# ---------------------------------------------------------------------------
# Run summaries (stats.rs:309-392)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BasicStats:
    """min/median/max/mean/std summary (stats.rs:373-392)."""

    name: str
    min: float
    median: float
    max: float
    mean: float
    std: float

    def __str__(self) -> str:
        return (
            f"{self.name} in [{self.min:.2f}, {self.max:.2f}], "
            f"median: {self.median:.2f}, mean: {self.mean:.2f} ± {self.std:.2f}"
        )


def basic_stats(name: str, data) -> BasicStats:
    """Summary preserving the reference's descending-sort median index
    ``data[len/2]`` and ddof=1 std (stats.rs:310-336).

    The sort replicates the reference comparator ``b.partial_cmp(a)``
    falling back to ``Ordering::Equal`` for NaN (stats.rs:312-316) via a
    stable host sort: NaNs compare equal to everything and stay in place
    — ``jnp.sort`` would instead push NaNs to one end, shifting the
    reported max/median whenever degenerate chains make ESS/R-hat NaN.
    (The arrays here are per-parameter summaries, so the host sort is a
    few elements.)

    NaN-placement parity is BEST-EFFORT, not bit-for-bit: the NaN-equal
    comparator is not a total order, and Python's Timsort need not produce
    the same permutation as Rust's stable sort for such a comparator, so
    inputs with multiple interior NaNs can order differently. All-finite
    inputs (the common case) match exactly."""
    import functools
    import math

    data = jnp.asarray(data, jnp.float32).ravel()
    n = data.shape[0]

    def _cmp(a, b):  # descending; NaN == anything (stats.rs:312-316)
        if math.isnan(a) or math.isnan(b):
            return 0
        return (a < b) - (a > b)

    desc = sorted((float(v) for v in data), key=functools.cmp_to_key(_cmp))
    std = float(jnp.std(data, ddof=1)) if n > 1 else 0.0
    return BasicStats(
        name=name,
        min=desc[-1],
        median=desc[n // 2],
        max=desc[0],
        mean=float(jnp.mean(data)),
        std=std,
    )


@dataclasses.dataclass
class RunStats:
    """Final run diagnostics: ESS and split R-hat summaries
    (stats.rs:339-371)."""

    ess: BasicStats
    rhat: BasicStats

    def __str__(self) -> str:
        return f"{self.ess}\n{self.rhat}"

    @classmethod
    def from_sample(cls, sample, *, time_major: bool = False) -> "RunStats":
        rhat, ess = split_rhat_mean_ess(sample, time_major=time_major)
        return cls(ess=basic_stats("ESS", ess), rhat=basic_stats("Split R-hat", rhat))


def run_stats(sample, *, time_major: bool = False) -> RunStats:
    """Convenience: final diagnostics for a ``[C, N, P]`` sample cube
    (``[N, C, P]`` with ``time_major=True``)."""
    return RunStats.from_sample(sample, time_major=time_major)
