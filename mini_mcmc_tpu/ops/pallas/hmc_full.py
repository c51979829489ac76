"""Fully-fused HMC step Pallas kernel: momentum RNG + trajectory + accept.

One level beyond the trajectory kernel (``ops/pallas/hmc.py``): after fusing
the L leapfrog steps, the remaining ~27 us per sampler step is the XLA-side
glue — momentum sampling, Hamiltonian bookkeeping, the accept draw and
masked update, plus layout round-trips. This kernel runs the *entire* HMC
update (``HMC::step``, /root/reference/src/hmc.rs:304-377) on-chip:

- momenta ~ N(0, 1) via the TPU hardware PRNG (`pltpu.prng_random_bits`)
  with a Box-Muller transform;
- L leapfrog steps with the cached half-step gradient trick;
- per-chain Metropolis accept with a hardware-PRNG uniform
  (accept iff ``H_cur - H_prop >= ln u``, hmc.rs:343-376);
- masked state update, all in the packed ``[D, 8, C/8]`` layout.

The PRNG stream is the TPU hardware generator, NOT the framework's threefry
stream — results are distribution-identical but not reproducible against
the standard path, so this kernel is opt-in (``HMC(use_pallas="full")``)
and aimed at throughput benchmarking/production sampling. Seeding is still
deterministic per (base seed, step, block).

TPU-only: the hardware PRNG primitives have no CPU interpreter lowering
(as of jax 0.9), so ``interpret=True`` works only for the non-RNG parts and
CI covers this kernel via its TPU statistics (see tests/test_pallas.py).
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

_normals = _rng.normals
_uniform = _rng.uniform


def make_pallas_hmc_step(
    grad_dc,
    logp_dc,
    step_size: float,
    n_leapfrog: int,
    *,
    block_c: int = 8192,
    interpret: bool = False,
):
    """Build the fused full-step function.

    Returns ``step(pos [C, D], logp [C], grad [C, D], seed int32[2], eps)
    -> (pos' [C, D], logp' [C], grad' [C, D])``. ``eps`` is the (possibly
    jittered) runtime step size; ``seed`` is the full 64-bit step key as two
    int32 scalars.

    Implemented as the K=1 case of :func:`make_pallas_hmc_multistep` with
    the per-step history output compiled out (``with_history=False`` — the
    current positions ARE the step's history, and pallas outputs are opaque
    to XLA DCE, so a discarded history would still be allocated and
    written every step). The hardware-PRNG stream is identical (same
    seeding, same draw order), so there is exactly one kernel body to
    maintain.
    """
    multi = make_pallas_hmc_multistep(
        grad_dc, logp_dc, step_size, n_leapfrog, 1,
        block_c=block_c, interpret=interpret, with_history=False,
    )

    @jax.jit
    def step(pos_cd, logp_c, grad_cd, seed, eps):
        return multi(pos_cd, logp_c, grad_cd, seed, eps)

    return step


def make_pallas_hmc_multistep(
    grad_dc,
    logp_dc,
    step_size: float,
    n_leapfrog: int,
    k_steps: int,
    *,
    block_c: int = 8192,
    interpret: bool = False,
    with_history: bool = True,
):
    """K fused sampler steps per kernel invocation.

    The single-step kernel's cost at the north-star config is dominated by
    a ~40-48 us per-step fixed overhead (scan-iteration glue, layout
    round-trips, kernel entry) — the L leapfrogs themselves are nearly
    free (measured v5e: 44 us/step at L=96 vs 59 us at L=384). Running K
    full HMC updates (momentum refresh + trajectory + accept, the
    hmc.rs:304-377 step) inside ONE kernel amortizes that fixed cost K
    ways. Every accepted position is still recorded: the kernel writes a
    ``[K, C, D]`` history (one row per sampler step), so the sample cube
    and its ESS semantics are identical to K separate steps.

    Returns ``step(pos [C, D], logp [C], grad [C, D], seed int32[2],
    eps [K]) -> (pos', logp', grad', hist [K, C, D])``. ``eps`` carries the
    per-step (possibly jittered) step sizes. The hardware-PRNG stream runs
    sequentially across the K steps, deterministic per (seed, block).
    ``with_history=False`` compiles the history output out entirely (and
    drops it from the return tuple) — for K=1 driving, where the returned
    positions already are the step's sample row.
    """
    if k_steps < 1:
        raise ValueError(f"k_steps must be >= 1, got {k_steps}")

    def kernel(seed_ref, eps_ref, pos_ref, logp_ref, grad_ref,
               pos_out, logp_out, grad_out, *hist_outs):
        # full 64-bit step key (two scalars; Mosaic caps prng_seed at two
        # values) — xor-folding to 32 bits would birthday-collide after
        # ~2^16 steps and replay noise. The block id is mixed into word 0.
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * jnp.int32(0x27D4EB2F),
            seed_ref[1],
        )
        pos0 = pos_ref[:]
        grad0 = grad_ref[:]
        logp0 = logp_ref[:]

        def one_step(k, carry):
            pos_c, logp_c, grad_c = carry
            eps = eps_ref[k]
            half_eps = eps * 0.5

            mom = _normals(pos_c.shape)
            h_cur = -logp_c + 0.5 * jnp.sum(mom * mom, axis=0)

            def body(_, lf):
                pos, mom, grad = lf
                mom = mom + grad * half_eps
                pos = pos + mom * eps
                grad = grad_dc(pos)
                mom = mom + grad * half_eps
                return pos, mom, grad

            pos, mom, grad = lax.fori_loop(
                0, n_leapfrog, body, (pos_c, mom, grad_c), unroll=True
            )

            logp = logp_dc(pos)
            h_prop = -logp + 0.5 * jnp.sum(mom * mom, axis=0)
            u = _uniform(h_prop.shape)
            accept = (h_cur - h_prop) >= jnp.log(u)

            pos_c = jnp.where(accept[None], pos, pos_c)
            grad_c = jnp.where(accept[None], grad, grad_c)
            logp_c = jnp.where(accept, logp, logp_c)
            if with_history:
                hist_outs[0][pl.ds(k, 1)] = pos_c[None]
            return pos_c, logp_c, grad_c

        pos_f, logp_f, grad_f = lax.fori_loop(
            0, k_steps, one_step, (pos0, logp0, grad0)
        )
        pos_out[:] = pos_f
        logp_out[:] = logp_f
        grad_out[:] = grad_f

    @functools.partial(jax.jit, static_argnames=())
    def step(pos_cd, logp_c, grad_cd, seed, eps_k):
        c, d = pos_cd.shape
        dtype = pos_cd.dtype
        bc = fit_grid_block(c, block_c)
        grid = (c // bc,)
        shape3 = (d, 8, c // 8)
        bc8 = bc // 8

        pos_p = pos_cd.T.reshape(shape3)
        grad_p = grad_cd.T.reshape(shape3)
        logp_p = logp_c.reshape(8, c // 8)

        seed_arr = jnp.asarray(seed, jnp.int32).reshape(2)
        eps_arr = jnp.asarray(eps_k, dtype).reshape(k_steps)

        dc_spec = pl.BlockSpec((d, 8, bc8), lambda i: (0, 0, i))
        lp_spec = pl.BlockSpec((8, bc8), lambda i: (0, i))
        hist_spec = pl.BlockSpec((k_steps, d, 8, bc8),
                                 lambda i: (0, 0, 0, i))
        if interpret:
            seed_spec = pl.BlockSpec((2,), lambda i: (0,))
            s_spec = pl.BlockSpec((k_steps,), lambda i: (0,))
        else:
            seed_spec = pl.BlockSpec((2,), lambda i: (0,),
                                     memory_space=pltpu.SMEM)
            s_spec = pl.BlockSpec((k_steps,), lambda i: (0,),
                                  memory_space=pltpu.SMEM)

        out_specs = [dc_spec, lp_spec, dc_spec]
        out_shape = [
            jax.ShapeDtypeStruct(shape3, dtype),
            jax.ShapeDtypeStruct((8, c // 8), dtype),
            jax.ShapeDtypeStruct(shape3, dtype),
        ]
        if with_history:
            out_specs.append(hist_spec)
            out_shape.append(
                jax.ShapeDtypeStruct((k_steps,) + shape3, dtype)
            )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[seed_spec, s_spec, dc_spec, lp_spec, dc_spec],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
        )(seed_arr, eps_arr, pos_p, logp_p, grad_p)

        pos_o, logp_o, grad_o = outs[:3]
        flat = (
            pos_o.reshape(d, c).T,
            logp_o.reshape(c),
            grad_o.reshape(d, c).T,
        )
        if not with_history:
            return flat
        hist = jnp.swapaxes(outs[3].reshape(k_steps, d, c), 1, 2)
        return flat + (hist,)

    return step
