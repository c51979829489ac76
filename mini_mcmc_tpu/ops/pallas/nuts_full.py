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
from .nuts_subtree import _DELTA, _count_trailing_ones, _popcount_i32


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
    -> (new_pos [C, D], alpha [C], n_alpha [C] f32, diverged [C] f32)``.
    ``depth_limit`` is the runtime tree-depth cap (the warmup cap,
    ops/nuts.py); ``alpha``/``n_alpha`` feed dual averaging outside.
    """

    def kernel(dl_ref, seed_ref, pos_ref, eps_ref,
               new_pos_o, alpha_o, n_alpha_o, dvg_o, stack):
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
        # a guaranteed-finite natural-layout vector (logu is finite at step
        # start): NaN laundering below needs a non-replicated fill operand
        neg_big = logu * 0.0 - 1e30

        def subtree(pos, mom, grad, v_sign, active, j):
            """2^j-leaf binary-counter subtree in direction ``v_sign``
            (the nuts_subtree.py kernel body, merge swaps from the
            sequential hardware stream). Returns (end_pos, end_mom,
            end_grad, prop_pos, n, s, alpha, n_alpha, dvg)."""
            eps_signed = eps * v_sign
            half = eps_signed * 0.5
            n_leaves = jnp.int32(1) << j

            def leaf_body(i, carry):
                (pos, mom, grad, s_run, n_tot, alpha_tot, n_alpha_tot,
                 dvg) = carry

                mom = mom + grad * half[None]
                pos = pos + mom * eps_signed[None]
                grad = grad_dc(pos)
                mom = mom + grad * half[None]
                logp = logp_dc(pos)

                joint = logp - 0.5 * jnp.sum(mom * mom, axis=0)
                n_leaf = (logu < joint).astype(jnp.float32)
                s_leaf = ((logu - _DELTA) < joint).astype(jnp.float32)
                # NaN-launder the energy difference: dead lanes keep
                # integrating (no early exit in-kernel) and can reach
                # inf - inf = NaN joints; the float-masked accumulators
                # below compute 0 * NaN = NaN, unlike XLA's select, so a
                # NaN alpha_leaf would poison the whole chain (a NaN lane
                # is dead anyway — n_leaf/s_leaf comparisons are false)
                delta = joint - joint0
                delta = jnp.where(delta == delta, delta, neg_big)
                alpha_leaf = jnp.minimum(1.0, jnp.exp(delta))

                live = active * s_run
                n_tot = n_tot + live * n_leaf
                alpha_tot = alpha_tot + live * alpha_leaf
                n_alpha_tot = n_alpha_tot + live
                dvg = jnp.maximum(dvg, live * (1.0 - s_leaf))
                s_run = s_run * s_leaf

                row = jnp.concatenate(
                    [pos, mom, pos, grad, logp[None], n_leaf[None]], axis=0
                )
                sp = _popcount_i32(i)
                stack[pl.ds(sp, 1)] = row[None]

                n_merges = _count_trailing_ones(i)

                def merge_body(k, mc):
                    s_run, top = mc
                    ia = sp - 1 - k
                    a_row = stack[pl.ds(ia, 1)][0]
                    n_a = a_row[4 * d + 1]
                    n_b = top[4 * d + 1]
                    u = _rng.uniform(lanes)
                    take_b = u < n_b / jnp.maximum(n_a + n_b, 1.0)

                    d_chrono = pos - a_row[0:d]
                    ok = (
                        (v_sign * jnp.sum(d_chrono * a_row[d:2 * d],
                                          axis=0)) >= 0.0
                    ) & ((v_sign * jnp.sum(d_chrono * mom, axis=0)) >= 0.0)

                    # rank-consistent selects: inside the outer while loop
                    # Mosaic's layout inference rejects the rank-2 select
                    # (`where(take_b, top[4d], a_row[4d])`) with a
                    # replicated-relayout error, so the logp row selects in
                    # the same [1, ...] broadcast form as the state rows
                    tb = take_b[None]
                    merged = jnp.concatenate(
                        [
                            a_row[0:d],
                            a_row[d:2 * d],
                            jnp.where(tb, top[2 * d:3 * d],
                                      a_row[2 * d:3 * d]),
                            jnp.where(tb, top[3 * d:4 * d],
                                      a_row[3 * d:4 * d]),
                            jnp.where(tb, top[4 * d][None],
                                      a_row[4 * d][None]),
                            (n_a + n_b)[None],
                        ],
                        axis=0,
                    )
                    stack[pl.ds(ia, 1)] = merged[None]
                    s_run = s_run * ok.astype(jnp.float32)
                    return s_run, merged

                s_run, _ = lax.fori_loop(0, n_merges, merge_body,
                                         (s_run, row))
                return (pos, mom, grad, s_run, n_tot, alpha_tot,
                        n_alpha_tot, dvg)

            zeros = jnp.zeros(lanes, jnp.float32)
            init = (pos, mom, grad, jnp.ones(lanes, jnp.float32),
                    zeros, zeros, zeros, zeros)
            (e_pos, e_mom, e_grad, s_run, n_tot, alpha_tot, n_alpha_tot,
             dvg) = lax.fori_loop(0, n_leaves, leaf_body, init)
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

    @functools.partial(jax.jit, static_argnames=())
    def step(pos, eps, depth_limit, seed):
        c, d = pos.shape
        dtype = pos.dtype
        bc = min(block_c, c)
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
        pos_o, alpha_o, n_alpha_o, dvg_o = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[dl_spec, seed_spec, dc_spec, lp_spec],
            out_specs=(dc_spec, lp_spec, lp_spec, lp_spec),
            out_shape=(
                jax.ShapeDtypeStruct(shape3, dtype),
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
        )

    return step
