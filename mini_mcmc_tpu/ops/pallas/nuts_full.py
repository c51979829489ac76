"""Fully-fused NUTS step Pallas kernel: the ENTIRE sampler update on-chip.

One level beyond the subtree kernel (``ops/pallas/nuts_subtree.py``): the
lockstep NUTS step is overhead-bound, not compute-bound (measured v5e: the
same ~0.3 ms/step at 8k and 65k chains — per-doubling fixed costs, layout
round-trips and scan glue dominate the masked leapfrogs). This kernel runs
the whole of ``NUTSChain::step`` (/root/reference/src/nuts.rs:550-674) in
ONE invocation:

- momentum ~ N(0, 1) and the slice variable ``logu = joint - Exp(1)``
  from the TPU hardware PRNG (nuts.rs:554-564);
- the doubling loop as an in-kernel ``lax.while_loop`` with per-chain
  masks and EARLY EXIT once every chain's ``s`` is false — directions,
  progressive-accept uniforms and merge swaps all drawn on-chip;
- each 2^j-leaf subtree via the same binary-counter builder as the
  subtree kernel, against a VMEM tree stack;
- the outer U-turn check between the trajectory ends (nuts.rs:665-672).

Dual averaging stays outside (cheap ``[C]`` XLA ops on the returned
``alpha``/``n_alpha``; ops/nuts.py). Like the other ``"full"`` kernels the
PRNG stream is the hardware generator, NOT the framework threefry stream —
opt-in via ``NUTS(use_pallas="full")``, statistical parity gated on
hardware (tests/test_tpu_parity.py, bench gates).

TPU-only: the hardware PRNG has no interpreter lowering (rng.py note).
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
from .nuts_subtree import _fit_block_c, build_subtree_inkernel


def make_pallas_nuts_step(
    grad_dc,
    logp_dc,
    max_depth: int,
    *,
    block_c: int = 8192,
    interpret: bool = False,
):
    """Build the fused full-step function.

    Returns ``step(pos [C, D], eps [C], depth_limit int32, seed int32[2])
    -> (new_pos [C, D], alpha [C], n_alpha [C] f32, diverged [C] f32,
    depth [C] f32)``. ``depth_limit`` is the runtime tree-depth cap (the
    warmup cap, ops/nuts.py); ``alpha``/``n_alpha`` feed dual averaging
    outside; ``depth`` is the block's executed doubling depth J (the
    lockstep cost is ``2^J - 1`` leapfrogs per lane — every lane of a
    grid block pays its block's depth, so the value is constant within a
    block but can differ across blocks).
    """

    def kernel(dl_ref, seed_ref, pos_ref, eps_ref,
               new_pos_o, alpha_o, n_alpha_o, dvg_o, depth_o, stack):
        d = pos_ref.shape[0]
        lanes = pos_ref.shape[1:]  # (8, bc8)
        depth_limit = dl_ref[0]
        # full 64-bit step key; block id mixed into word 0 so grid blocks
        # draw independent streams (hmc_full.py seeding note)
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * jnp.int32(0x27D4EB2F),
            seed_ref[1],
        )

        eps = eps_ref[:]
        pos0 = pos_ref[:]
        mom0 = _rng.normals(pos0.shape)
        grad0 = grad_dc(pos0)
        logp0 = logp_dc(pos0)
        joint0 = logp0 - 0.5 * jnp.sum(mom0 * mom0, axis=0)
        # logu = joint - Exp(1) (nuts.rs:563-564); Exp(1) = -ln U
        logu = joint0 + jnp.log(_rng.uniform(lanes))

        def subtree(pos, mom, grad, v_sign, active, j):
            """2^j-leaf subtree in direction ``v_sign`` via the SHARED
            in-kernel builder (nuts_subtree.py), merge swaps from the
            sequential hardware stream. Returns (end_pos, end_mom,
            end_grad, prop_pos, n, s, alpha, n_alpha, dvg)."""
            (e_pos, e_mom, e_grad, s_run, n_tot, alpha_tot, n_alpha_tot,
             dvg) = build_subtree_inkernel(
                stack, grad_dc, logp_dc,
                lambda i, k: _rng.uniform(lanes),
                pos=pos, mom=mom, grad=grad, eps_signed=eps * v_sign,
                v_sign=v_sign, logu=logu, joint0=joint0, active=active,
                n_leaves=jnp.int32(1) << j,
            )
            root = stack[pl.ds(0, 1)][0]
            return (e_pos, e_mom, e_grad, root[2 * d:3 * d],
                    n_tot, s_run, alpha_tot, n_alpha_tot, dvg)

        # -- doubling loop (nuts.rs:578-674), early exit when all chains
        # stop -------------------------------------------------------------
        # carry inits derive from loaded data: splat constants carry the
        # REPLICATED vector layout, and Mosaic cannot relayout the loop
        # body's natural-layout results back to replicated (the while
        # carry must be layout-stable)
        zeros = pos0[0] * 0.0
        ones = zeros + 1.0

        def cond(c):
            j, s = c[0], c[9]
            return (j < depth_limit) & (jnp.max(s) > 0.0)

        def body(c):
            (j, pos_m, mom_m, grad_m, pos_p, mom_p, grad_p,
             pos_sel, n, s, alpha, n_alpha, dvg) = c

            # rank-2 masks stay float arithmetic throughout: inside the
            # while carry Mosaic's layout inference rejects rank-2 selects
            # against broadcast/replicated operands (Invalid relayout);
            # rank-3 ([None]-broadcast over D) selects are fine
            vbits = _rng.random_bits(lanes)
            v = (vbits >= 0).astype(jnp.float32) * 2.0 - 1.0  # fair coin
            neg = (v < 0.0)[None]
            start_pos = jnp.where(neg, pos_m, pos_p)
            start_mom = jnp.where(neg, mom_m, mom_p)
            start_grad = jnp.where(neg, grad_m, grad_p)

            (e_pos, e_mom, e_grad, prop_pos, r_n, r_s, r_alpha,
             r_n_alpha, r_dvg) = subtree(start_pos, start_mom, start_grad,
                                         v, s, j)

            upd_m = neg & (s > 0.5)[None]
            upd_p = (~neg) & (s > 0.5)[None]
            pos_m = jnp.where(upd_m, e_pos, pos_m)
            mom_m = jnp.where(upd_m, e_mom, mom_m)
            grad_m = jnp.where(upd_m, e_grad, grad_m)
            pos_p = jnp.where(upd_p, e_pos, pos_p)
            mom_p = jnp.where(upd_p, e_mom, mom_p)
            grad_p = jnp.where(upd_p, e_grad, grad_p)

            # progressive accept u < min(1, n'/n) (nuts.rs:656-663)
            ratio = r_n / jnp.maximum(n, 1.0)
            u2 = _rng.uniform(lanes)
            take = (
                s * r_s * (u2 < jnp.minimum(1.0, ratio)).astype(jnp.float32)
            )
            pos_sel = jnp.where((take > 0.5)[None], prop_pos, pos_sel)

            n = n + s * r_n
            dd = pos_p - pos_m
            no_uturn = (
                (jnp.sum(dd * mom_m, axis=0) >= 0.0)
                & (jnp.sum(dd * mom_p, axis=0) >= 0.0)
            ).astype(jnp.float32)
            alpha = s * r_alpha + (1.0 - s) * alpha
            n_alpha = s * r_n_alpha + (1.0 - s) * n_alpha
            dvg = jnp.maximum(dvg, s * r_dvg)
            s = s * r_s * no_uturn
            return (j + 1, pos_m, mom_m, grad_m, pos_p, mom_p, grad_p,
                    pos_sel, n, s, alpha, n_alpha, dvg)

        init = (jnp.int32(0), pos0, mom0, grad0, pos0, mom0, grad0,
                pos0, ones, ones, zeros, zeros, zeros)
        (_j, _pm, _mm, _gm, _pp, _mp, _gp, pos_sel, _n, _s, alpha,
         n_alpha, dvg) = lax.while_loop(cond, body, init)

        new_pos_o[:] = pos_sel
        alpha_o[:] = alpha
        n_alpha_o[:] = n_alpha
        dvg_o[:] = dvg
        # executed doubling depth, broadcast over the block's lanes in the
        # loaded layout (zeros carries it; a fresh splat would be
        # replicated-layout and trip Mosaic's relayout checks)
        depth_o[:] = zeros + _j.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=())
    def step(pos, eps, depth_limit, seed):
        c, d = pos.shape
        dtype = pos.dtype
        if dtype != jnp.float32:
            raise ValueError(
                "the fused NUTS step kernel is float32-only (f32 VMEM "
                f"tree stack + hardware-PRNG draws); got positions of "
                f"dtype {dtype}. Use the XLA or per-subtree paths for "
                "other dtypes."
            )
        bc = _fit_block_c(block_c, c, d, max_depth)
        if c % bc or bc % 1024:
            raise ValueError(
                f"n_chains={c} must be a multiple of block_c={bc} and 1024"
            )
        grid = (c // bc,)
        shape3 = (d, 8, c // 8)
        lanes = (8, c // 8)
        bc8 = bc // 8

        dc_spec = pl.BlockSpec((d, 8, bc8), lambda i: (0, 0, i))
        lp_spec = pl.BlockSpec((8, bc8), lambda i: (0, i))
        if interpret:
            dl_spec = pl.BlockSpec((1,), lambda i: (0,))
            seed_spec = pl.BlockSpec((2,), lambda i: (0,))
        else:
            dl_spec = pl.BlockSpec((1,), lambda i: (0,),
                                   memory_space=pltpu.SMEM)
            seed_spec = pl.BlockSpec((2,), lambda i: (0,),
                                     memory_space=pltpu.SMEM)

        f32 = jnp.float32
        pos_o, alpha_o, n_alpha_o, dvg_o, depth_o = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[dl_spec, seed_spec, dc_spec, lp_spec],
            out_specs=(dc_spec, lp_spec, lp_spec, lp_spec, lp_spec),
            out_shape=(
                jax.ShapeDtypeStruct(shape3, dtype),
                jax.ShapeDtypeStruct(lanes, f32),
                jax.ShapeDtypeStruct(lanes, f32),
                jax.ShapeDtypeStruct(lanes, f32),
                jax.ShapeDtypeStruct(lanes, f32),
            ),
            scratch_shapes=[
                pltpu.VMEM((max_depth + 1, 4 * d + 2, 8, bc8), f32),
            ],
            interpret=interpret,
        )(
            jnp.asarray(depth_limit, jnp.int32).reshape(1),
            jnp.asarray(seed, jnp.int32).reshape(2),
            pos.T.reshape(shape3),
            eps.astype(f32).reshape(lanes),
        )
        return (
            pos_o.reshape(d, c).T,
            alpha_o.reshape(c),
            n_alpha_o.reshape(c),
            dvg_o.reshape(c),
            depth_o.reshape(c),
        )

    return step
