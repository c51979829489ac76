"""Fully-fused K-sweep Gibbs Pallas kernel.

The XLA Gibbs step (``ops/gibbs.py``, the batched redesign of
``GibbsMarkovChain::step``, /root/reference/src/gibbs.rs:95-99) runs one
coordinate sweep per scan iteration; at large chain counts its cost is
dominated by the same fixed overheads the fused MH kernel eliminates
(scan-iteration glue, HBM round-trips of the [C, D] state between the
per-coordinate fused XLA kernels). This kernel runs K complete sweeps
on-chip per invocation in the sublane-packed ``[D, 8, C/8]`` layout:

- each coordinate draw comes from the conditional's chains-on-lanes form
  (``Conditional.sample_dc``) using the TPU hardware PRNG (``rng``
  namespace) — the in-kernel analog of the reference's per-chain
  ``rand::rng()`` draws (gibbs.rs:119-124);
- the sweep over coordinates is statically unrolled (it is inherently
  sequential: coordinate i conditions on the freshly updated state,
  gibbs.rs:96-98); chains ride the vector lanes;
- every post-sweep state is written to an on-chip ``[K, C, D]`` history,
  so the sample cube is identical in meaning to K separate steps.

Like ``mh_full.py`` this path is opt-in (``GibbsSampler(use_pallas="full")``):
the hardware-PRNG stream is distribution-identical to the framework's
threefry stream but not reproducible against it, and it is TPU-only (no CPU
interpreter lowering for the PRNG primitives).
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


def make_pallas_gibbs_multistep(
    sample_dc,
    n_dim: int,
    k_steps: int,
    *,
    block_c: int = 8192,
    interpret: bool = False,
    with_history: bool = True,
):
    """Build the fused K-sweep Gibbs block function.

    Args:
        sample_dc: chains-on-lanes conditional
            ``(rng, index, state [D, ...]) -> [...]`` drawing coordinate
            ``index`` (a STATIC Python int — the sweep is unrolled) for all
            chains with the in-kernel hardware PRNG namespace
            (``ops/pallas/rng``). jnp ops only (Mosaic-lowerable).
        n_dim: state dimension D (static; the unrolled sweep length).
        k_steps: complete sweeps fused per kernel invocation.

    Returns ``step(pos [C, D], seed int32[2]) -> (pos' [C, D],
    hist [K, C, D])``. ``with_history=False`` compiles the history output
    out entirely (for K=1 driving, where the returned positions already are
    the step's sample row and pallas outputs are opaque to XLA DCE).
    """
    if k_steps < 1:
        raise ValueError(f"k_steps must be >= 1, got {k_steps}")
    if n_dim < 1:
        raise ValueError(f"n_dim must be >= 1, got {n_dim}")

    def kernel(seed_ref, pos_ref, pos_out, *hist_outs):
        # full 64-bit step key; the block id is mixed into word 0 so grid
        # blocks draw independent streams (mh_full.py seeding note).
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * jnp.int32(0x27D4EB2F),
            seed_ref[1],
        )

        def one_sweep(k, pos):
            # coordinate sweep, statically unrolled: coordinate i
            # conditions on the freshly updated state (gibbs.rs:96-98)
            for i in range(n_dim):
                val = sample_dc(_rng, i, pos)
                rows = [pos[j][None] for j in range(n_dim)]
                rows[i] = val[None]
                pos = jnp.concatenate(rows, axis=0)
            if with_history:
                hist_outs[0][pl.ds(k, 1)] = pos[None]
            return pos

        pos_out[:] = lax.fori_loop(0, k_steps, one_sweep, pos_ref[:])

    @functools.partial(jax.jit, static_argnames=())
    def step(pos_cd, seed):
        c, d = pos_cd.shape
        if d != n_dim:
            raise ValueError(f"state dim {d} != kernel n_dim {n_dim}")
        dtype = pos_cd.dtype
        bc = fit_grid_block(c, block_c)
        grid = (c // bc,)
        shape3 = (d, 8, c // 8)
        bc8 = bc // 8

        pos_p = pos_cd.T.reshape(shape3)
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(2)

        dc_spec = pl.BlockSpec((d, 8, bc8), lambda i: (0, 0, i))
        hist_spec = pl.BlockSpec((k_steps, d, 8, bc8),
                                 lambda i: (0, 0, 0, i))
        if interpret:
            seed_spec = pl.BlockSpec((2,), lambda i: (0,))
        else:
            seed_spec = pl.BlockSpec((2,), lambda i: (0,),
                                     memory_space=pltpu.SMEM)

        out_specs = [dc_spec]
        out_shape = [jax.ShapeDtypeStruct(shape3, dtype)]
        if with_history:
            out_specs.append(hist_spec)
            out_shape.append(
                jax.ShapeDtypeStruct((k_steps,) + shape3, dtype)
            )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[seed_spec, dc_spec],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
        )(seed_arr, pos_p)

        pos_f = outs[0].reshape(d, c).T
        if not with_history:
            return (pos_f,)
        hist = jnp.swapaxes(outs[1].reshape(k_steps, d, c), 1, 2)
        return pos_f, hist

    return step
