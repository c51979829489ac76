"""Fully-fused K-step Metropolis-Hastings Pallas kernel.

The XLA MH step (``ops/mh.py``, the batched redesign of
``MHMarkovChain::step``, /root/reference/src/metropolis_hastings.rs:303-315)
is already one compiled scan — but at large chain counts its per-step cost
is dominated by the same fixed overheads the fused HMC kernel eliminates
(scan-iteration glue, HBM round-trips of the state between fused XLA
kernels). This kernel runs K complete MH updates on-chip per invocation in
the sublane-packed ``[D, 8, C/8]`` layout:

- proposal draw via the TPU hardware PRNG (``propose_dc``, supplied by the
  proposal — e.g. isotropic Gaussian noise or the +-1 integer walk);
- target evaluation via the target's chains-on-lanes ``logp_dc``;
- per-chain accept iff ``logp' - logp > ln u`` (strict, matching
  metropolis_hastings.rs:309-313 and ``ops/mh.py``) with a hardware-PRNG
  uniform — proposal log-density terms cancel (symmetric proposals only,
  enforced by the caller);
- every post-accept position written to an on-chip ``[K, C, D]`` history,
  so the sample cube and its ESS semantics are identical to K separate
  steps (nothing is thinned).

Positions may be integer dtype (discrete targets, lib.rs:153-209) or float;
the cached log density is always float32. Like ``hmc_full.py`` this path is
opt-in (``MetropolisHastings(use_pallas="full")``): the hardware-PRNG
stream is distribution-identical to the framework's threefry stream but not
reproducible against it, and it is TPU-only (no CPU interpreter lowering
for the PRNG primitives).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from . import rng as _rng
from .blocks import fit_grid_block


def make_pallas_mh_multistep(
    logp_dc,
    propose_dc,
    k_steps: int,
    *,
    block_c: int = 8192,
    interpret: bool = False,
    with_history: bool = True,
):
    """Build the fused K-step MH block function.

    Args:
        logp_dc: chains-on-lanes target log density ``[D, ...] -> [...]``
            (jnp ops only, Mosaic-lowerable — see ``utils/mathx`` for the
            discrete targets' log-gamma).
        propose_dc: ``(rng, pos [D, ...]) -> proposed [D, ...]`` where
            ``rng`` is the in-kernel hardware PRNG namespace
            (``ops/pallas/rng``). Must be a SYMMETRIC proposal (the kernel
            skips the q terms of the accept ratio).
        k_steps: complete MH updates fused per kernel invocation.

    Returns ``step(pos [C, D], logp [C], seed int32[2]) ->
    (pos' [C, D], logp' [C], hist [K, C, D])``. ``with_history=False``
    compiles the history output out entirely (and drops it from the
    return) — for K=1 driving, where the returned positions already are
    the step's sample row and pallas outputs are opaque to XLA DCE.
    """
    if k_steps < 1:
        raise ValueError(f"k_steps must be >= 1, got {k_steps}")

    def kernel(seed_ref, pos_ref, logp_ref, pos_out, logp_out, *hist_outs):
        # full 64-bit step key (two scalars; Mosaic caps prng_seed at two
        # values); the block id is mixed into word 0 so grid blocks draw
        # independent streams.
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * jnp.int32(0x27D4EB2F),
            seed_ref[1],
        )

        def one_step(k, carry):
            pos, logp = carry
            prop = propose_dc(_rng, pos)
            lp = logp_dc(prop)
            u = _rng.uniform(lp.shape)
            accept = (lp - logp) > jnp.log(u)
            pos = jnp.where(accept[None], prop, pos)
            logp = jnp.where(accept, lp, logp)
            if with_history:
                hist_outs[0][pl.ds(k, 1)] = pos[None]
            return pos, logp

        pos_f, logp_f = lax.fori_loop(
            0, k_steps, one_step, (pos_ref[:], logp_ref[:])
        )
        pos_out[:] = pos_f
        logp_out[:] = logp_f

    @functools.partial(jax.jit, static_argnames=())
    def step(pos_cd, logp_c, seed):
        c, d = pos_cd.shape
        dtype = pos_cd.dtype
        lp_dtype = logp_c.dtype
        bc = fit_grid_block(c, block_c)
        grid = (c // bc,)
        shape3 = (d, 8, c // 8)
        bc8 = bc // 8

        pos_p = pos_cd.T.reshape(shape3)
        logp_p = logp_c.reshape(8, c // 8)
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(2)

        dc_spec = pl.BlockSpec((d, 8, bc8), lambda i: (0, 0, i))
        lp_spec = pl.BlockSpec((8, bc8), lambda i: (0, i))
        hist_spec = pl.BlockSpec((k_steps, d, 8, bc8),
                                 lambda i: (0, 0, 0, i))
        if interpret:
            seed_spec = pl.BlockSpec((2,), lambda i: (0,))
        else:
            seed_spec = pl.BlockSpec((2,), lambda i: (0,),
                                     memory_space=pltpu.SMEM)

        out_specs = [dc_spec, lp_spec]
        out_shape = [
            jax.ShapeDtypeStruct(shape3, dtype),
            jax.ShapeDtypeStruct((8, c // 8), lp_dtype),
        ]
        if with_history:
            out_specs.append(hist_spec)
            out_shape.append(
                jax.ShapeDtypeStruct((k_steps,) + shape3, dtype)
            )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[seed_spec, dc_spec, lp_spec],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
        )(seed_arr, pos_p, logp_p)

        flat = (outs[0].reshape(d, c).T, outs[1].reshape(c))
        if not with_history:
            return flat
        hist = jnp.swapaxes(outs[2].reshape(k_steps, d, c), 1, 2)
        return flat + (hist,)

    return step
