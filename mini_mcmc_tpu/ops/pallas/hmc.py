"""Fused HMC leapfrog-trajectory Pallas kernel.

The XLA leapfrog scan costs ~2 us per leapfrog step on [8192, 3] chains —
loop/dispatch overhead, not compute (the integrator body is ~10 VPU ops on
~100 KB). This kernel runs the *entire* L-step trajectory inside one Pallas
invocation: positions/momenta/gradients stay in VMEM (registers) for all L
steps, eliminating the per-iteration overhead. This is the "fused leapfrog"
below-framework kernel called for by the build plan (SURVEY.md section 7,
mirroring the role of the reference's hot loop at
/root/reference/src/hmc.rs:397-431).

Layout: chains ride the TPU lane dimension — arrays are ``[D, C]``
(structure-of-arrays), so D (small, e.g. 3) sits on sublanes and C (large)
on 128-wide lanes. The batched HMC kernel transposes at the kernel boundary
(98 KB for 8192x3 — noise next to the trajectory work).

Targets supply ``grad_dc`` / ``logp_dc`` functions operating on ``[D, C]``
arrays with plain jnp ops (Pallas-compatible); see
``mini_mcmc_tpu.models.rosenbrock.rosenbrock_nd``.
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


def pallas_available() -> bool:
    """True when Pallas TPU lowering is usable on the current backend."""
    if not _PALLAS_OK:
        return False
    return jax.default_backend() == "tpu"


def make_pallas_leapfrog(
    grad_dc,
    logp_dc,
    step_size: float,
    n_leapfrog: int,
    *,
    block_c: int = 8192,
    interpret: bool = False,
    packed: bool = True,
):
    """Build a fused trajectory function.

    Args:
        grad_dc: ``[D, C] -> [D, C]`` gradient of logp in chains-on-lanes
            layout (jnp ops only).
        logp_dc: ``[D, C] -> [C]`` log density in the same layout.
        step_size: leapfrog epsilon.
        n_leapfrog: number of leapfrog steps fused into the kernel.
        block_c: chains per kernel block (grid tiles the chain axis).
        interpret: run in the Pallas interpreter (CPU testing).

        packed: reshape the chain axis to ``[D, 8, C/8]`` so small-D state
            fills all 8 VPU sublanes instead of D of them (a ~8/D-fold cut
            in vector instructions for D < 8). Requires ``C % 1024 == 0``
            and axis-0-only semantics in ``grad_dc``/``logp_dc`` (leading
            -axis slicing/concat/sum work unchanged on the packed shape);
            falls back to the flat layout otherwise.

    Returns:
        ``traj(pos [C, D], mom [C, D], grad [C, D], eps) ->
        (pos' [C, D], mom' [C, D], logp' [C], grad' [C, D])`` — the same
        contract as the XLA leapfrog in ``ops/hmc.py`` (one gradient
        evaluation per step via the cached half-step trick). ``eps`` is a
        runtime scalar (enables per-step step-size jitter); ``step_size`` is
        only the default when ``eps`` is None.
    """

    def kernel(eps_ref, pos_ref, mom_ref, grad_ref, pos_out, mom_out,
               logp_out, grad_out):
        eps = eps_ref[0, 0]
        half_eps = eps * 0.5
        pos = pos_ref[:]
        mom = mom_ref[:]
        grad = grad_ref[:]

        def body(_, carry):
            pos, mom, grad = carry
            mom = mom + grad * half_eps
            pos = pos + mom * eps
            grad = grad_dc(pos)
            mom = mom + grad * half_eps
            return pos, mom, grad

        pos, mom, grad = lax.fori_loop(
            0, n_leapfrog, body, (pos, mom, grad), unroll=True
        )
        pos_out[:] = pos
        mom_out[:] = mom
        grad_out[:] = grad
        logp_out[:] = logp_dc(pos)[None] if pos.ndim == 2 else logp_dc(pos)

    @functools.partial(jax.jit, static_argnames=())
    def traj(pos_cd, mom_cd, grad_cd, eps=None):
        c, d = pos_cd.shape
        dtype = pos_cd.dtype
        if eps is None:
            eps = jnp.asarray(step_size, dtype)
        eps_arr = jnp.asarray(eps, dtype).reshape(1, 1)
        bc = min(block_c, c)
        if c % bc:
            raise ValueError(f"n_chains={c} must be divisible by block_c={bc}")
        grid = (c // bc,)
        use_packed = packed and bc % 1024 == 0

        pos_dc = pos_cd.T
        mom_dc = mom_cd.T
        grad_dc_in = grad_cd.T

        if use_packed:
            # [D, C] -> [D, 8, C/8]: fill all 8 sublanes with chains.
            shape3 = (d, 8, c // 8)
            bc8 = bc // 8
            inputs = [
                x.reshape(shape3) for x in (pos_dc, mom_dc, grad_dc_in)
            ]
            dc_spec = pl.BlockSpec((d, 8, bc8), lambda i: (0, 0, i))
            lp_spec = pl.BlockSpec((8, bc8), lambda i: (0, i))
            out_shape = (
                jax.ShapeDtypeStruct(shape3, dtype),
                jax.ShapeDtypeStruct(shape3, dtype),
                jax.ShapeDtypeStruct((8, c // 8), dtype),
                jax.ShapeDtypeStruct(shape3, dtype),
            )
        else:
            inputs = [pos_dc, mom_dc, grad_dc_in]
            dc_spec = pl.BlockSpec((d, bc), lambda i: (0, i))
            lp_spec = pl.BlockSpec((1, bc), lambda i: (0, i))
            out_shape = (
                jax.ShapeDtypeStruct((d, c), dtype),
                jax.ShapeDtypeStruct((d, c), dtype),
                jax.ShapeDtypeStruct((1, c), dtype),
                jax.ShapeDtypeStruct((d, c), dtype),
            )

        if interpret:
            eps_spec = pl.BlockSpec((1, 1), lambda i: (0, 0))
        else:
            eps_spec = pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            )
        pos_o, mom_o, logp_o, grad_o = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[eps_spec, dc_spec, dc_spec, dc_spec],
            out_specs=(dc_spec, dc_spec, lp_spec, dc_spec),
            out_shape=out_shape,
            interpret=interpret,
        )(eps_arr, *inputs)

        if use_packed:
            pos_o = pos_o.reshape(d, c)
            mom_o = mom_o.reshape(d, c)
            grad_o = grad_o.reshape(d, c)
            logp_o = logp_o.reshape(c)
        else:
            logp_o = logp_o[0]
        return pos_o.T, mom_o.T, logp_o, grad_o.T

    return traj
