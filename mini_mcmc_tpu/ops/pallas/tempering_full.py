"""Fully-fused K-step parallel-tempering Pallas kernel.

The XLA PT step (``ops/tempering.py``) is one compiled scan, but — like
plain MH before it (``mh_full.py``) — at large chain counts its per-step
cost is dominated by fixed overheads (scan glue, HBM round-trips of the
replica batch between fused XLA kernels) rather than the VPU work of the
tempered update itself. This kernel runs K complete PT steps on-chip per
invocation, carrying the whole replica batch in VMEM:

- the temperature ladder stays a BATCHED array axis inside the kernel
  (``[D, T, 8, C/8]`` — rungs ride a leading dim of every op, exactly like
  the XLA path's ``[T, D, C]``), NOT a Python-unrolled list: one
  ``logp_dc`` evaluation / one hardware-PRNG draw / one accept covers all
  T rungs, so per-op Mosaic overhead amortizes over ``T*C`` lanes (the
  unrolled variant measured 3x SLOWER than XLA at T=8, D=1 — T small ops
  per stage lose to one T-times-larger op);
- per-rung constants (``beta``, the ``sigma/sqrt(beta)`` proposal scale,
  the alternating-parity pair mask) are compile-time ``[T, 1, 1]`` arrays
  broadcast against the batch, with the pair parity at in-kernel step k
  derived from the carried scalar (``(parity0 + k) % 2``);
- the swap sweep is two ladder-axis neighbor shifts + boolean selects
  (accepted pairs are disjoint), the same shift-not-gather design as the
  XLA path; accepts and swaps use true ``jnp.where`` selects so a
  ``-inf`` log density (bounded-support target) propagates exactly like
  the XLA path instead of poisoning the carry with NaN;
- only the COLD rung's position is written to the ``[K, D, 8, C/8]``
  history — the sample cube semantics are identical to K separate steps
  (hot replicas are internal state), and the hot rungs never touch HBM
  inside a block.

Opt-in via ``ParallelTempering(use_pallas="full")``: requires
``target.logp_dc`` (the chains-on-lanes form, jnp-ops-only); the
hardware-PRNG stream is distribution-identical to the XLA path's threefry
stream but not reproducible against it; TPU-only (no CPU interpreter
lowering for the PRNG primitives).
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

#: EWMA weight — must match ops/tempering.py's XLA path.
from ..tempering import _SWAP_EWMA_ALPHA


def make_pallas_pt_multistep(
    logp_dc,
    betas,
    sigma,
    k_steps: int,
    *,
    n_inner: int = 1,
    block_c: int = 8192,
    interpret: bool = False,
    with_history: bool = True,
):
    """Build the fused K-step PT block function.

    Args:
        logp_dc: chains-on-lanes target log density ``[D, ...] -> [...]``
            (jnp ops only, Mosaic-lowerable; the trailing dims here are
            the ``[T, 8, C/8]`` replica batch).
        betas: the static temperature ladder (validated by the caller,
            ``ops/tempering.py``).
        sigma: static cold-chain proposal scale — a Python float or a
            length-D sequence (per-dimension).
        k_steps: complete PT steps fused per kernel invocation.
        n_inner: within-temperature sweeps per swap sweep.

    Returns ``step(pos [T, D, C], logp [T, C], swap_accept [T-1, C],
    parity int32, seed int32[2]) -> (pos', logp', swap_accept',
    hist [K, C, D])`` where ``hist`` holds the cold rung's positions after
    each fused step (dropped when ``with_history=False``).
    """
    if k_steps < 1:
        raise ValueError(f"k_steps must be >= 1, got {k_steps}")
    betas = tuple(float(b) for b in betas)
    t_count = len(betas)
    alpha = _SWAP_EWMA_ALPHA

    def kernel(sp_ref, scale_ref, beta_ref, dbeta_ref, par_ref,
               pos_ref, lp_ref, sa_ref,
               pos_out, lp_out, sa_out, *hist_outs):
        pltpu.prng_seed(
            sp_ref[0] + pl.program_id(0) * jnp.int32(0x27D4EB2F),
            sp_ref[1],
        )
        parity0 = sp_ref[2]

        # Per-(dim, rung) proposal scale sigma_d / sqrt(beta_t), per-rung
        # temperatures, and pair parities arrive pre-broadcast to the
        # replica-batch tile shapes as ordinary inputs (Pallas forbids
        # captured array constants); loaded once, carried in VMEM.
        scale = scale_ref[...]  # [D, T, 8, bc8]
        beta_b = beta_ref[...]  # [T, 8, bc8]
        d_beta = dbeta_ref[...]  # [T-1, 8, bc8]
        pair_par = par_ref[...]  # [T-1, 8, bc8] (t % 2 per pair)

        def one_step(k, carry):
            pos, lp, sa = carry  # [D,T,8,bc8], [T,8,bc8], [T-1,8,bc8]

            # Within-temperature sweeps: ONE lockstep MH update over the
            # whole [T, 8, bc8] replica batch per sweep.
            # True selects, not float-mask arithmetic: `lp + accf*(lp_p -
            # lp)` turns a rejected -inf proposal (bounded-support target)
            # into NaN and silently freezes the chain; jnp.where keeps the
            # XLA path's -inf semantics (mh_full.py uses the same carried
            # selects, so Mosaic lowers them fine).
            for _ in range(n_inner):
                prop = pos + scale * _rng.normals(pos.shape)
                lp_p = logp_dc(prop)  # [T, 8, bc8]
                u = _rng.uniform(lp_p.shape)
                acc = (beta_b * (lp_p - lp)) > jnp.log(u)
                pos = jnp.where(acc[None], prop, pos)
                lp = jnp.where(acc, lp_p, lp)

            # Alternating-parity swap sweep: accepted pairs are disjoint,
            # so every swap applies at once as two ladder-axis neighbor
            # shifts + boolean selects (no gather).
            k_par = ((parity0 + k) % 2).astype(jnp.float32)
            on = pair_par == k_par  # [T-1, 8, bc8] bool
            u = _rng.uniform(sa.shape)
            sw = on & ((d_beta * (lp[1:] - lp[:-1])) > jnp.log(u))
            off_row = jnp.zeros_like(sw[:1])
            lower = jnp.concatenate([sw, off_row], 0)  # t takes from t+1
            upper = jnp.concatenate([off_row, sw], 0)  # t takes from t-1
            shift_up = jnp.concatenate([lp[1:], lp[-1:]], 0)
            shift_dn = jnp.concatenate([lp[:1], lp[:-1]], 0)
            lp = jnp.where(lower, shift_up,
                           jnp.where(upper, shift_dn, lp))
            pshift_up = jnp.concatenate([pos[:, 1:], pos[:, -1:]], 1)
            pshift_dn = jnp.concatenate([pos[:, :1], pos[:, :-1]], 1)
            pos = jnp.where(lower[None], pshift_up,
                            jnp.where(upper[None], pshift_dn, pos))
            # EWMA only on active pairs: sa += on * alpha * (sw - sa);
            # sa/sw are finite 0/1 quantities, so arithmetic is safe here.
            swf = jnp.where(sw, 1.0, 0.0)
            onf = jnp.where(on, 1.0, 0.0)
            sa = sa + onf * alpha * (swf - sa)

            if with_history:
                hist_outs[0][pl.ds(k, 1)] = pos[:, 0][None]
            return (pos, lp, sa)

        out = lax.fori_loop(
            0, k_steps, one_step, (pos_ref[...], lp_ref[...], sa_ref[...])
        )
        pos_out[...], lp_out[...], sa_out[...] = out

    @functools.partial(jax.jit, static_argnames=())
    def step(pos_tdc, lp_tc, sa_tc, parity, seed):
        t, d, c = pos_tdc.shape
        assert t == t_count
        bc = fit_grid_block(c, block_c, what="fused PT kernel")
        grid = (c // bc,)
        bc8 = bc // 8
        c8 = c // 8

        # [T, D, C] -> [D, T, 8, C/8]: rungs ride a leading batch dim so
        # in-kernel ops cover the whole ladder at once (one transpose per
        # K-step block, amortized).
        pos_p = pos_tdc.transpose(1, 0, 2).reshape(d, t, 8, c8)
        lp_p = lp_tc.reshape(t, 8, c8)
        sa_p = sa_tc.reshape(t - 1, 8, c8)
        sp_arr = jnp.concatenate([
            jnp.asarray(seed, jnp.int32).reshape(2),
            jnp.asarray(parity, jnp.int32).reshape(1),
        ])

        # The static per-rung constants, pre-broadcast to one [.., 8, bc8]
        # block each (identical across grid blocks: constant index maps).
        sig_rows = jnp.asarray(sigma, jnp.float32).reshape(-1)
        if sig_rows.shape[0] not in (1, d):
            raise ValueError(
                f"sigma must be scalar or length-D, got {sig_rows.shape}"
            )
        inv_sqrt_b = jnp.asarray(
            [1.0 / (b ** 0.5) for b in betas], jnp.float32
        )
        scale_in = jnp.broadcast_to(
            (jnp.broadcast_to(sig_rows, (d,))[:, None]
             * inv_sqrt_b)[:, :, None, None],
            (d, t, 8, bc8),
        )
        beta_col = jnp.asarray(betas, jnp.float32)[:, None, None]
        beta_in = jnp.broadcast_to(beta_col, (t, 8, bc8))
        dbeta_in = jnp.broadcast_to(
            beta_col[:-1] - beta_col[1:], (t - 1, 8, bc8)
        )
        par_in = jnp.broadcast_to(
            jnp.asarray([float(i % 2) for i in range(t - 1)],
                        jnp.float32)[:, None, None],
            (t - 1, 8, bc8),
        )

        pos_spec = pl.BlockSpec((d, t, 8, bc8), lambda i: (0, 0, 0, i))
        lp_spec = pl.BlockSpec((t, 8, bc8), lambda i: (0, 0, i))
        sa_spec = pl.BlockSpec((t - 1, 8, bc8), lambda i: (0, 0, i))
        scale_spec = pl.BlockSpec((d, t, 8, bc8), lambda i: (0, 0, 0, 0))
        beta_spec = pl.BlockSpec((t, 8, bc8), lambda i: (0, 0, 0))
        pair_spec = pl.BlockSpec((t - 1, 8, bc8), lambda i: (0, 0, 0))
        hist_spec = pl.BlockSpec((k_steps, d, 8, bc8),
                                 lambda i: (0, 0, 0, i))
        if interpret:
            sp_spec = pl.BlockSpec((3,), lambda i: (0,))
        else:
            sp_spec = pl.BlockSpec((3,), lambda i: (0,),
                                   memory_space=pltpu.SMEM)

        out_specs = [pos_spec, lp_spec, sa_spec]
        out_shape = [
            jax.ShapeDtypeStruct((d, t, 8, c8), pos_tdc.dtype),
            jax.ShapeDtypeStruct((t, 8, c8), lp_tc.dtype),
            jax.ShapeDtypeStruct((t - 1, 8, c8), sa_tc.dtype),
        ]
        if with_history:
            out_specs.append(hist_spec)
            out_shape.append(
                jax.ShapeDtypeStruct((k_steps, d, 8, c8), pos_tdc.dtype)
            )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[sp_spec, scale_spec, beta_spec, pair_spec,
                      pair_spec, pos_spec, lp_spec, sa_spec],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
        )(sp_arr, scale_in, beta_in, dbeta_in, par_in, pos_p, lp_p, sa_p)

        flat = (
            outs[0].reshape(d, t, c).transpose(1, 0, 2),
            outs[1].reshape(t, c),
            outs[2].reshape(t - 1, c),
        )
        if not with_history:
            return flat
        # cold-rung history [K, D, 8, c8] -> user layout [K, C, D]
        hist = jnp.swapaxes(outs[3].reshape(k_steps, d, c), 1, 2)
        return flat + (hist,)

    return step
