"""Vectorized Metropolis-Hastings step kernel.

TPU-native redesign of the reference's per-chain scalar loop
(``MHMarkovChain::step``, /root/reference/src/metropolis_hastings.rs:303-315):
all chains advance in lockstep as a ``[n_chains, D]`` batch; propose, evaluate
target and proposal log densities, and accept with a masked ``where`` instead
of a branch. Integer state dtypes are supported for discrete targets
(/root/reference/src/lib.rs:153-209).

The current target log density is cached in the state, halving target
evaluations per step relative to the reference's recompute (numerically
identical: the cache is exactly the previous evaluation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.base import Proposal, Target


class MHState(NamedTuple):
    positions: jax.Array  # [n_chains, D] (float or integer dtype)
    logp: jax.Array  # [n_chains] cached unnormalized target log density


def mh_kernel(target: Target, proposal: Proposal):
    """Build ``(init_fn, step_fn)`` for batched MH.

    ``init_fn(positions [C, D]) -> MHState``
    ``step_fn(state, key) -> MHState``
    """

    def init_fn(positions: jax.Array) -> MHState:
        return MHState(positions=positions, logp=target.batch_logp(positions))

    def step_fn(state: MHState, key: jax.Array) -> MHState:
        n_chains = state.positions.shape[0]
        key_prop, key_u = jax.random.split(key)

        if proposal.sample_batch is not None:
            proposed = proposal.sample_batch(key_prop, state.positions)
        else:
            prop_keys = jax.random.split(key_prop, n_chains)
            proposed = jax.vmap(proposal.sample)(prop_keys, state.positions)
        proposed_lp = target.batch_logp(proposed)
        log_q_fwd = jax.vmap(proposal.logp)(state.positions, proposed)
        log_q_bwd = jax.vmap(proposal.logp)(proposed, state.positions)

        # log alpha = (logp' + logq_back) - (logp + logq_fwd); accept iff
        # log alpha > ln(u)  (metropolis_hastings.rs:309-313).
        log_accept = (proposed_lp + log_q_bwd) - (state.logp + log_q_fwd)
        u = jax.random.uniform(key_u, (n_chains,), log_accept.dtype)
        accept = log_accept > jnp.log(u)

        positions = jnp.where(accept[:, None], proposed, state.positions)
        logp = jnp.where(accept, proposed_lp, state.logp)
        return MHState(positions=positions, logp=logp)

    return init_fn, step_fn
