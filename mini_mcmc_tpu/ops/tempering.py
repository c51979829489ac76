"""Parallel tempering / replica exchange (beyond-reference capability).

The standard remedy for multimodal targets that defeat single-temperature
samplers (Swendsen & Wang 1986; Geyer 1991): each logical chain runs T
replicas against the tempered densities ``beta_t * logp`` for a ladder
``1 = beta_0 > beta_1 > ... > beta_{T-1} > 0``, and neighboring replicas
periodically exchange states with the Metropolis rule

    log alpha_swap = (beta_t - beta_{t+1}) * (logp(x_{t+1}) - logp(x_t)).

Hot replicas see a nearly-flat landscape and hop between modes; exchanges
percolate those jumps down to the cold (beta = 1) replica, whose trajectory
is the sample. The Rust reference has no tempering.

TPU-native design: the temperature ladder is just another batch dimension —
all ``T * C`` replicas advance in one lockstep ``[T, C, D]``
random-walk-Metropolis batch (with the per-temperature proposal scale
``sigma / sqrt(beta_t)``, matching the tempered density's width), and a
swap sweep is a vectorized ``take_along_axis`` permutation over the ladder
axis: even pairs on even steps, odd pairs on odd steps (the standard
alternating scheme), decided for all chains at once. No per-replica loops,
no host round-trips; the whole step compiles into the collection scan like
every other kernel.

The state keeps the ladder axis SEPARATE from the chain axis (``[T, C, D]``
rather than a flattened ``[T*C, D]``) so multi-chip sharding lands on the
chain axis: ``parallel.shard_sampler_state`` places chains over the mesh
and replicates the (small) ladder axis, the within-temperature sweep stays
embarrassingly parallel, and the swap permutation gathers along the
REPLICATED ladder axis — device-local, zero collectives in the sampling
scan (pinned by ``tests/test_parallel.py``). Where a thread-per-chain
design needs cross-worker state exchange for swaps, this layout needs a
local gather.

The recorded sample cube contains ONLY the cold replicas (``[C, N, D]``);
hot replicas are internal state (checkpointed with it). A streaming EWMA of
per-pair swap acceptance is carried in the state — the quantity
practitioners use to tune the ladder (aim for roughly 20-40%).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..models.base import Target
from ..runner import make_scan_block_fn

#: EWMA weight for the streaming swap-acceptance diagnostic (matches the
#: spirit of the trackers' ALPHA=0.01 acceptance EWMA, stats.py).
_SWAP_EWMA_ALPHA = 0.05


class PTState(NamedTuple):
    positions: jax.Array  # [T, C, D]; row 0 is the cold (beta=1) ladder rung
    raw_logp: jax.Array  # [T, C] UNtempered target log density cache
    parity: jax.Array  # int32 scalar: which pair parity swaps next
    #: [T-1, C] EWMA of each (pair, chain)'s swap-accept indicator. Kept
    #: PER CHAIN so the hot loop reduces nothing across the (sharded)
    #: chain axis — the ladder-mean is taken at read time
    #: (ParallelTempering.swap_acceptance), outside the sampling scan.
    swap_accept: jax.Array


#: Chain-axis index per field (None = replicate), consumed by
#: ``parallel.shard_sampler_state``: chains are axis 1 here, not the
#: default leading axis, and the ladder/pair axes must be replicated so
#: swap gathers stay device-local.
PTState.CHAIN_AXIS_INDEX = {
    "positions": 1,
    "raw_logp": 1,
    "parity": None,
    "swap_accept": 1,
}


def geometric_betas(n_temps: int, beta_min: float = 0.01) -> tuple:
    """A geometric temperature ladder ``1 -> beta_min`` (the default
    choice: equal log-spacing gives roughly uniform swap rates when the
    target's energy scale is self-similar)."""
    if n_temps < 2:
        raise ValueError(f"n_temps must be >= 2, got {n_temps}")
    if not 0.0 < beta_min < 1.0:
        raise ValueError(f"beta_min must be in (0, 1), got {beta_min}")
    import numpy as np

    return tuple(float(b) for b in np.geomspace(1.0, beta_min, n_temps))


def tempering_kernel(target: Target, betas: Sequence[float], *,
                     proposal_std=1.0, n_inner: int = 1,
                     steps_per_call: int = 1):
    """Build ``(init_fn, step_fn)`` for replica-exchange random-walk MH.

    ``init_fn(positions [C, D]) -> PTState`` replicates the cold-chain
    initial positions across the ladder. One ``step_fn`` call is
    ``n_inner`` lockstep within-temperature MH sweeps followed by one
    alternating-parity swap sweep. ``proposal_std``: cold-chain random-walk
    scale (scalar or per-dimension ``[D]``); replica t proposes with
    ``proposal_std / sqrt(beta_t)``.
    """
    betas = tuple(float(b) for b in betas)
    if len(betas) < 2:
        raise ValueError("betas must have >= 2 temperatures "
                         f"(got {betas!r}); tempering with one replica "
                         "is plain MH")
    if abs(betas[0] - 1.0) > 1e-12:
        raise ValueError(f"betas[0] must be 1.0 (the cold chain), "
                         f"got {betas[0]}")
    if any(b2 >= b1 for b1, b2 in zip(betas, betas[1:])) or betas[-1] <= 0:
        raise ValueError("betas must be strictly decreasing and positive, "
                         f"got {betas!r}")
    if n_inner < 1:
        raise ValueError(f"n_inner must be >= 1, got {n_inner}")
    if steps_per_call < 1:
        raise ValueError(f"steps_per_call must be >= 1, got {steps_per_call}")
    t_count = len(betas)
    beta_col = jnp.asarray(betas, jnp.float32)[:, None]  # [T, 1]

    batch_logp_l = jax.vmap(target.batch_logp)  # [T, C, D] -> [T, C]

    def init_fn(positions: jax.Array) -> PTState:
        lp = target.batch_logp(positions)  # [C]
        return PTState(
            positions=jnp.tile(positions[None], (t_count, 1, 1)),
            raw_logp=jnp.tile(lp[None], (t_count, 1)),
            parity=jnp.zeros((), jnp.int32),
            swap_accept=jnp.zeros(
                (t_count - 1, positions.shape[0]), jnp.float32
            ),
        )

    def _inner_sweep(key, positions, raw_logp, sigma_l):
        """One within-temperature MH update for all [T, C] replicas."""
        k_prop, k_u = jax.random.split(key)
        noise = jax.random.normal(k_prop, positions.shape, positions.dtype)
        proposed = positions + sigma_l * noise
        prop_lp = batch_logp_l(proposed)  # [T, C]
        log_acc = beta_col * (prop_lp - raw_logp)
        u = jax.random.uniform(k_u, log_acc.shape, log_acc.dtype)
        accept = log_acc > jnp.log(u)
        return (
            jnp.where(accept[..., None], proposed, positions),
            jnp.where(accept, prop_lp, raw_logp),
        )

    def step_fn(state: PTState, key: jax.Array) -> PTState:
        c = state.positions.shape[1]
        k_inner, k_swap = jax.random.split(key)

        # Per-replica proposal scale: sigma / sqrt(beta) — sigma may be a
        # scalar or per-dimension [D]; broadcast over the [T, C, D] batch.
        sigma = jnp.atleast_1d(
            jnp.asarray(proposal_std, state.positions.dtype)
        )
        inv_sqrt_beta = 1.0 / jnp.sqrt(beta_col[:, 0])  # [T]
        sigma_l = inv_sqrt_beta[:, None, None] * sigma[None, None, :]

        positions, raw_logp = state.positions, state.raw_logp
        for sub in jax.random.split(k_inner, n_inner):
            positions, raw_logp = _inner_sweep(
                sub, positions, raw_logp, sigma_l
            )

        # Swap sweep: pairs (t, t+1) with t = parity (mod 2), all chains
        # at once. take_from[t, chain] = ladder row this replica pulls its
        # new state from (identity when the pair holds). The gather runs
        # along the replicated ladder axis — local under chain sharding.
        pos_l, lp_l = positions, raw_logp
        t_idx = jnp.arange(t_count - 1)
        pair_active = (t_idx % 2) == (state.parity % 2)  # [T-1]
        delta_beta = beta_col[:-1, 0] - beta_col[1:, 0]  # [T-1] > 0
        log_acc = delta_beta[:, None] * (lp_l[1:] - lp_l[:-1])  # [T-1, C]
        u = jax.random.uniform(k_swap, log_acc.shape, log_acc.dtype)
        swap = pair_active[:, None] & (log_acc > jnp.log(u))  # [T-1, C]

        take_from = jnp.broadcast_to(
            jnp.arange(t_count)[:, None], (t_count, c)
        )
        # row t of an accepted pair takes t+1; row t+1 takes t. Pairs are
        # disjoint (alternating parity), so the two updates cannot clash.
        lower = jnp.pad(swap, ((0, 1), (0, 0)))  # row t is a pair's lower
        upper = jnp.pad(swap, ((1, 0), (0, 0)))  # row t is a pair's upper
        take_from = jnp.where(lower, take_from + 1, take_from)
        take_from = jnp.where(upper, take_from - 1, take_from)
        pos_l = jnp.take_along_axis(pos_l, take_from[:, :, None], axis=0)
        lp_l = jnp.take_along_axis(lp_l, take_from, axis=0)

        # Streaming per-(pair, chain) swap-accept EWMA, only for this
        # step's active pairs — elementwise over [T-1, C], so nothing
        # reduces across the (sharded) chain axis inside the scan.
        swap_accept = jnp.where(
            pair_active[:, None],
            (1.0 - _SWAP_EWMA_ALPHA) * state.swap_accept
            + _SWAP_EWMA_ALPHA * swap.astype(jnp.float32),
            state.swap_accept,
        )
        return PTState(
            positions=pos_l,
            raw_logp=lp_l,
            parity=(state.parity + 1) % 2,
            swap_accept=swap_accept,
        )

    if steps_per_call > 1:
        step_fn.block_fn = make_scan_block_fn(step_fn, steps_per_call)
        step_fn.block_size = steps_per_call

    return init_fn, step_fn
