"""Fully-fused K-step parallel-tempering Pallas kernel.

The XLA PT step (``ops/tempering.py``) is one compiled scan, but — like
plain MH before it (``mh_full.py``) — at large chain counts its per-step
cost is dominated by fixed overheads (scan glue, HBM round-trips of the
replica batch between fused XLA kernels) rather than the VPU work of the
tempered update itself. This kernel runs K complete PT steps on-chip per
invocation:

- the temperature ladder is STATIC (T is small), so rungs are
  Python-unrolled: each rung's ``[D, 8, C/8]`` sublane-packed block gets a
  hardware-PRNG Gaussian proposal scaled by ``sigma / sqrt(beta_t)``, a
  ``logp_dc`` target evaluation, and a tempered accept — T lockstep MH
  updates sharing one instruction stream;
- the alternating-parity swap sweep is unrolled over pairs with the parity
  at in-kernel step k derived from the carried scalar
  (``(parity0 + k) % 2``); swaps and the per-(pair, chain) acceptance EWMA
  use float-mask arithmetic (Mosaic's layout inference rejects some
  carried selects — see ``nuts_full.py``'s notes);
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
            (jnp ops only, Mosaic-lowerable).
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

    def kernel(sp_ref, pos_ref, lp_ref, sa_ref,
               pos_out, lp_out, sa_out, *hist_outs):
        pltpu.prng_seed(
            sp_ref[0] + pl.program_id(0) * jnp.int32(0x27D4EB2F),
            sp_ref[1],
        )
        parity0 = sp_ref[2]

        d = pos_ref.shape[1]
        sig_rows = jnp.asarray(sigma, jnp.float32).reshape(-1)
        if sig_rows.shape[0] not in (1, d):
            raise ValueError(
                f"sigma must be scalar or length-D, got {sig_rows.shape}"
            )
        sig_col = jnp.broadcast_to(sig_rows, (d,))[:, None, None]

        def one_step(k, carry):
            pos = list(carry[:t_count])  # T x [D, 8, bc8]
            lp = list(carry[t_count:2 * t_count])  # T x [8, bc8]
            sa = list(carry[2 * t_count:])  # (T-1) x [8, bc8]

            # Within-temperature sweeps, rungs unrolled (one instruction
            # stream, T lockstep MH updates).
            for _ in range(n_inner):
                for t in range(t_count):
                    scale = (1.0 / (betas[t] ** 0.5)) * sig_col
                    prop = pos[t] + scale * _rng.normals(pos[t].shape)
                    lp_p = logp_dc(prop)
                    u = _rng.uniform(lp_p.shape)
                    acc = (betas[t] * (lp_p - lp[t])) > jnp.log(u)
                    accf = jnp.where(acc, 1.0, 0.0)
                    pos[t] = pos[t] + accf[None] * (prop - pos[t])
                    lp[t] = lp[t] + accf * (lp_p - lp[t])

            # Alternating-parity swap sweep, pairs unrolled. Active pairs
            # are disjoint, so sequential masked application == one
            # simultaneous permutation.
            k_par = (parity0 + k) % 2
            for t in range(t_count - 1):
                on = jnp.where((t % 2) == k_par, 1.0, 0.0)  # traced scalar
                d_beta = betas[t] - betas[t + 1]
                u = _rng.uniform(lp[t].shape)
                sw = jnp.where(
                    (d_beta * (lp[t + 1] - lp[t])) > jnp.log(u), 1.0, 0.0
                ) * on  # [8, bc8] float mask
                hi, lo = pos[t + 1], pos[t]
                pos[t] = lo + sw[None] * (hi - lo)
                pos[t + 1] = hi + sw[None] * (lo - hi)
                lph, lpl = lp[t + 1], lp[t]
                lp[t] = lpl + sw * (lph - lpl)
                lp[t + 1] = lph + sw * (lpl - lph)
                # EWMA only on active pairs: sa += on * alpha * (sw - sa)
                sa[t] = sa[t] + on * alpha * (sw - sa[t])

            if with_history:
                hist_outs[0][pl.ds(k, 1)] = pos[0][None]
            return tuple(pos) + tuple(lp) + tuple(sa)

        carry0 = (
            tuple(pos_ref[t] for t in range(t_count))
            + tuple(lp_ref[t] for t in range(t_count))
            + tuple(sa_ref[t] for t in range(t_count - 1))
        )
        out = lax.fori_loop(0, k_steps, one_step, carry0)
        for t in range(t_count):
            pos_out[t] = out[t]
            lp_out[t] = out[t_count + t]
        for t in range(t_count - 1):
            sa_out[t] = out[2 * t_count + t]

    @functools.partial(jax.jit, static_argnames=())
    def step(pos_tdc, lp_tc, sa_tc, parity, seed):
        t, d, c = pos_tdc.shape
        assert t == t_count
        bc = min(block_c, c)
        if c % 1024 or c % bc or bc % 1024:
            raise ValueError(
                f"the fused PT kernel needs n_chains to be a multiple of "
                f"1024 (8 sublanes x 128 lanes) and of the grid block "
                f"block_c={block_c} (itself a 1024-multiple); got "
                f"n_chains={c}"
            )
        grid = (c // bc,)
        bc8 = bc // 8
        c8 = c // 8

        pos_p = pos_tdc.reshape(t, d, 8, c8)
        lp_p = lp_tc.reshape(t, 8, c8)
        sa_p = sa_tc.reshape(t - 1, 8, c8)
        sp_arr = jnp.concatenate([
            jnp.asarray(seed, jnp.int32).reshape(2),
            jnp.asarray(parity, jnp.int32).reshape(1),
        ])

        pos_spec = pl.BlockSpec((t, d, 8, bc8), lambda i: (0, 0, 0, i))
        lp_spec = pl.BlockSpec((t, 8, bc8), lambda i: (0, 0, i))
        sa_spec = pl.BlockSpec((t - 1, 8, bc8), lambda i: (0, 0, i))
        hist_spec = pl.BlockSpec((k_steps, d, 8, bc8),
                                 lambda i: (0, 0, 0, i))
        if interpret:
            sp_spec = pl.BlockSpec((3,), lambda i: (0,))
        else:
            sp_spec = pl.BlockSpec((3,), lambda i: (0,),
                                   memory_space=pltpu.SMEM)

        out_specs = [pos_spec, lp_spec, sa_spec]
        out_shape = [
            jax.ShapeDtypeStruct((t, d, 8, c8), pos_tdc.dtype),
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
            in_specs=[sp_spec, pos_spec, lp_spec, sa_spec],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
        )(sp_arr, pos_p, lp_p, sa_p)

        flat = (
            outs[0].reshape(t, d, c),
            outs[1].reshape(t, c),
            outs[2].reshape(t - 1, c),
        )
        if not with_history:
            return flat
        # cold-rung history [K, D, 8, c8] -> user layout [K, C, D]
        hist = jnp.swapaxes(outs[3].reshape(k_steps, d, c), 1, 2)
        return flat + (hist,)

    return step
