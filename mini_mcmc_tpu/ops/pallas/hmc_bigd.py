"""Fused large-D HMC kernels for SEPARABLE targets.

The fused kernels in ``hmc.py``/``hmc_full.py`` put chains on lanes with
the WHOLE state dimension resident in VMEM per block — the right layout
for the reference-shaped tiny-D targets (D <= ~64), impossible at
D = 10,000 (one [10000, 8192] f32 block is 328 MB). At large D the XLA
leapfrog is memory/VPU-bound instead: the [C, D] pos/mom/grad state
streams through HBM once per unrolled leapfrog group (measured ~0.4x of
HBM peak on the d=10,000 bench stage, bench.py ``hmc_d10000_1024c``).

For a SEPARABLE target — ``logp(x) = sum_d f_d(x_d)`` — the physics
factorizes: each coordinate's (position, momentum) evolves under leapfrog
independently of every other coordinate (the gradient of a separable
density is elementwise). Only the Metropolis accept couples coordinates,
and it needs just three scalars per chain: the proposal's log density and
the initial/final kinetic energies. So the ENTIRE L-step trajectory can
run per ``[block_c, block_d]`` tile entirely in VMEM:

- momentum is drawn in-kernel (hardware PRNG, paired Box-Muller) and
  NEVER touches HBM — it lives and dies in vector registers;
- the gradient is recomputed per tile from the density by AD
  (elementwise for separable targets) — no [C, D] gradient cache
  streams through HBM either;
- the integrator uses the merged-kick leapfrog form (interior half-kicks
  pair into full kicks — mathematically identical, fewer VPU ops, and
  the trajectory here is VPU-bound once it is VMEM-resident).

The kernel emits the proposal and per-(chain, d-tile) partial sums of
``logp(pos_prop)`` and the two kinetic energies; the accept/select runs
in XLA over all of D (it must see every coordinate). A variant with the
accept fused in-kernel over full-D tiles was built and measured SLOWER
at L=40 (an unexplained Mosaic scheduling effect on the loop) and no
faster at L=10, so the one kernel shape is kept. The sampler state for
this tier (``ops/hmc.py HMCSepState``) carries no gradient cache at all.

Measured on v5e at the bench stage shape (1,024 chains x d = 10,000):
1.2x the tuned XLA leapfrog per sampler step at L = 10, 1.9x at L = 40
(the kernel's per-leapfrog slope is ~2.6x cheaper; the remaining fixed
cost is the XLA accept/select pass and the per-step momentum RNG); see
bench.py ``hmc_d10000_1024c`` for the gated numbers.

The reference has no analog (its HMC is the generic small-D batched path,
/root/reference/src/hmc.rs:304-431); this kernel exists because TPU-shaped
problems (SURVEY.md section 5's "large-d axis") hit the memory wall the
reference never reaches. Opt in with ``HMC(use_pallas="separable")`` —
construction validates separability on the actual initial positions
(:func:`mini_mcmc_tpu.models.base.validate_separable`), so a correlated
target raises instead of silently sampling a product approximation.

PRNG: the TPU hardware generator (like ``hmc_full.py``) — distribution-
identical to the threefry path, different stream. The momentum-input
debug variant (``mom_input=True``) skips the RNG entirely and is
interpreter-safe; the CPU parity tests drive it against the XLA leapfrog.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:  # pragma: no cover - import guard mirrors ops/pallas/__init__
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from . import rng as _rng

#: per-array VMEM element budget for one [block_c, block_d] f32 tile
#: (~2 MB); pos + mom + grad + elementwise temps stay well inside the
#: ~16 MB VMEM with headroom for Mosaic's double buffering.
_TILE_ELEMS = 1 << 19


def _divisors(n: int) -> set:
    out = set()
    i = 1
    while i * i <= n:
        if n % i == 0:
            out.add(i)
            out.add(n // i)
        i += 1
    return out


def pick_tile(c: int, d: int, block_c: int | None, block_d: int | None):
    """Choose a ``[bc, bd]`` tile obeying Mosaic's block rules: the last
    (lane) block dim must be a 128-multiple or the FULL ``d``; the
    sublane block dim an 8-multiple or the full ``c``. The d-axis rides
    the 128-wide lanes, so the search prefers the largest lane-aligned
    divisor of ``d`` that still admits a legal chain tile INSIDE the
    VMEM element budget (the first auto-picker maximised ``bd`` before
    checking the budget, so a ``c`` with no 8-multiple divisor fell back
    to a full-``c`` tile up to ~13x over budget — a Mosaic VMEM compile
    failure at shapes like c=100, d=65536). Dims with no aligned divisor
    (d = 10,000 = 2^4 * 5^4 has no 128-multiple one) use the full dim on
    that axis. Explicit ``block_c``/``block_d`` are divisibility-checked
    only (interpreter tests use tiny unaligned blocks), with a hard
    backstop far above any legal tile."""
    if block_d and d % block_d:
        raise ValueError(f"block_d={block_d} must divide dim={d}")
    if block_c and c % block_c:
        raise ValueError(f"block_c={block_c} must divide n_chains={c}")
    # Mosaic-legal options per axis: aligned divisors, or the full dim.
    bc_opts = ([block_c] if block_c else
               sorted(k for k in _divisors(c) if k % 8 == 0 or k == c))
    bd_opts = ([block_d] if block_d else
               sorted((k for k in _divisors(d) if k % 128 == 0 or k == d),
                      reverse=True))
    fallback = None  # smallest legal tile, used when nothing fits
    for bd in bd_opts:  # widest lane tile first
        fit = [k for k in bc_opts if k * bd <= _TILE_ELEMS]
        if fit:
            return max(fit), bd
        if fallback is None or bc_opts[0] * bd < fallback[0] * fallback[1]:
            fallback = (bc_opts[0], bd)
    bc, bd = fallback
    if bc * bd > ((1 << 23) if (block_c or block_d) else 2 * _TILE_ELEMS):
        raise ValueError(
            f"no Mosaic-legal tile for [{c}, {d}] fits the VMEM budget: "
            f"the smallest is [{bc}, {bd}] = {bc * bd * 4} bytes/array "
            f"(budget {_TILE_ELEMS * 4}). Pass explicit block_c/block_d, "
            "or pad n_chains to a multiple of 8 / dim to a multiple of "
            "128 so an aligned divisor exists."
        )
    return bc, bd


def _make_tile_trajectory(tile_logp, n_leapfrog: int):
    """The VMEM-resident L-step integrator over one coordinate tile, with
    the in-tile gradient derived from the density by AD (elementwise for
    separable targets). ``tile_logp(x [c', d'], *tables each [1, d'])``;
    the gradient is taken w.r.t. the positions only — the coordinate
    tables (a diag-metric scale, transform group masks) are constants of
    the trajectory."""

    def tile_grad(x, tabs):
        out, vjp = jax.vjp(lambda xx: tile_logp(xx, *tabs), x)
        (g,) = vjp(jnp.ones_like(out))
        return g

    def trajectory(pos, mom, eps, tabs):
        # merged-kick leapfrog: interior half-kicks pair into one full
        # kick (mathematically identical to the half/half form; ~2 fewer
        # VPU ops per element per step — measurable when the whole
        # trajectory is VMEM-resident and VPU-bound)
        half = eps * 0.5
        mom = mom + tile_grad(pos, tabs) * half

        def body(i, carry):
            pos, mom = carry
            pos = pos + eps * mom
            kick = jnp.where(i < n_leapfrog - 1, eps, half)
            mom = mom + tile_grad(pos, tabs) * kick
            return pos, mom

        pos, mom = lax.fori_loop(
            0, n_leapfrog, body, (pos, mom), unroll=True
        )
        return pos, mom

    return trajectory


def _scalar_spec(n, interpret):
    if interpret:
        return pl.BlockSpec((n,), lambda i, *_: (0,))
    return pl.BlockSpec((n,), lambda i, *_: (0,),
                        memory_space=pltpu.SMEM)


def make_pallas_hmc_separable(
    tile_logp,
    n_leapfrog: int,
    *,
    n_tables: int = 0,
    block_c: int | None = None,
    block_d: int | None = None,
    interpret: bool = False,
    mom_input: bool = False,
):
    """Build the TRAJECTORY-ONLY separable kernel (accept runs in XLA).

    Args:
        tile_logp: ``(x [C', D'], *tables each [1, D']) -> [C']`` log
            density contribution of a coordinate slice (the separability
            contract: partial sums over a coordinate partition must
            reconstruct the full density — checked by
            ``validate_separable`` at sampler construction). With
            ``n_tables == 0`` this is a plain slice-agnostic batch form
            (valid for iid-coordinate densities); per-coordinate
            parameters (a diag-metric scale, transform group masks, a
            heterogeneous Gaussian's variances) ride the TABLES — each a
            ``[1, D]`` array whose matching slice is delivered to every
            tile by the Pallas grid mapping, so the density form itself
            never indexes by coordinate. The in-tile gradient is derived
            from it by AD w.r.t. the positions only (elementwise for
            separable targets).
        n_leapfrog: leapfrog steps fused into the kernel.
        n_tables: number of ``[1, D]`` coordinate tables the density
            consumes (``Target.sep_forms()``).
        block_c / block_d: tile shape (divisors of C / D); ``None`` picks
            automatically (:func:`pick_tile`).
        interpret: Pallas interpreter (CPU) — only with ``mom_input``
            (the hardware PRNG has no interpreter lowering).
        mom_input: debug/parity variant that takes the initial momentum
            as an argument instead of drawing it in-kernel, and also
            returns the final momentum (both [C, D] — this variant pays
            the HBM traffic the production one avoids).

    Returns:
        production: ``traj(pos [C, D], seed int32[2], eps, *tables) ->
        (pos_prop [C, D], pe [C, Gd], ke0 [C, Gd], ke1 [C, Gd])``
        where ``Gd = D / block_d`` and per chain
        ``logp(pos_prop) = sum(pe, axis=1)``,
        ``|mom_0|^2 / 2 = sum(ke0, axis=1)``,
        ``|mom_L|^2 / 2 = sum(ke1, axis=1)``.

        debug: ``traj(pos, mom [C, D], eps, *tables) ->
        (pos_prop, mom_prop [C, D], pe, ke0, ke1)``.
    """
    trajectory = _make_tile_trajectory(tile_logp, n_leapfrog)

    def kernel(seed_ref, eps_ref, pos_ref, *rest):
        tabs = tuple(r[:] for r in rest[:n_tables])
        pos_out, pe_out, ke0_out, ke1_out = rest[n_tables:]
        # distinct (i, j) tiles get distinct seed PAIRS: the d-tile index
        # perturbs word 1, the c-tile index word 0 — no cross-tile stream
        # aliasing is possible within a step.
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * jnp.int32(0x27D4EB2F),
            seed_ref[1] + pl.program_id(1) * jnp.int32(0x165667B1),
        )
        eps = eps_ref[0]
        pos = pos_ref[:]
        mom = _rng.normals_paired(pos.shape)
        ke0_out[:] = 0.5 * jnp.sum(mom * mom, axis=1, keepdims=True)
        pos, mom = trajectory(pos, mom, eps, tabs)
        pos_out[:] = pos
        # pin the user density's output dtype (CLAUDE.md kernel invariant:
        # under jax_enable_x64 a promoting logp would fail the f32 ref swap)
        pe_out[:] = tile_logp(pos, *tabs).astype(pos.dtype)[:, None]
        ke1_out[:] = 0.5 * jnp.sum(mom * mom, axis=1, keepdims=True)

    def kernel_debug(eps_ref, pos_ref, mom_ref, *rest):
        tabs = tuple(r[:] for r in rest[:n_tables])
        pos_out, mom_out, pe_out, ke0_out, ke1_out = rest[n_tables:]
        eps = eps_ref[0]
        pos = pos_ref[:]
        mom = mom_ref[:]
        ke0_out[:] = 0.5 * jnp.sum(mom * mom, axis=1, keepdims=True)
        pos, mom = trajectory(pos, mom, eps, tabs)
        pos_out[:] = pos
        mom_out[:] = mom
        pe_out[:] = tile_logp(pos, *tabs).astype(pos.dtype)[:, None]
        ke1_out[:] = 0.5 * jnp.sum(mom * mom, axis=1, keepdims=True)

    @functools.partial(jax.jit, static_argnames=())
    def traj(pos_cd, arg2, eps, *tables):
        c, d = pos_cd.shape
        dtype = pos_cd.dtype
        if len(tables) != n_tables:
            raise ValueError(
                f"kernel built for {n_tables} coordinate tables, "
                f"called with {len(tables)}"
            )
        for t in tables:
            if t.shape != (1, d):
                raise ValueError(
                    f"coordinate tables must be [1, {d}]; got {t.shape}"
                )
        bc, bd = pick_tile(c, d, block_c, block_d)
        grid = (c // bc, d // bd)
        gd = d // bd

        eps_arr = jnp.asarray(eps, dtype).reshape(1)
        tile_spec = pl.BlockSpec((bc, bd), lambda i, j: (i, j))
        # each tile receives ITS [1, bd] slice of every coordinate table
        # via the grid mapping — no in-kernel coordinate indexing
        table_spec = pl.BlockSpec((1, bd), lambda i, j: (0, j))
        part_spec = pl.BlockSpec((bc, 1), lambda i, j: (i, j))
        part_shape = jax.ShapeDtypeStruct((c, gd), dtype)
        table_specs = [table_spec] * n_tables

        if mom_input:
            mom_cd = jnp.asarray(arg2, dtype)
            return pl.pallas_call(
                kernel_debug,
                grid=grid,
                in_specs=[_scalar_spec(1, interpret), tile_spec, tile_spec,
                          *table_specs],
                out_specs=(tile_spec, tile_spec, part_spec, part_spec,
                           part_spec),
                out_shape=(
                    jax.ShapeDtypeStruct((c, d), dtype),
                    jax.ShapeDtypeStruct((c, d), dtype),
                    part_shape, part_shape, part_shape,
                ),
                interpret=interpret,
            )(eps_arr, pos_cd, mom_cd, *tables)

        seed_arr = jnp.asarray(arg2, jnp.int32).reshape(2)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[_scalar_spec(2, interpret),
                      _scalar_spec(1, interpret), tile_spec, *table_specs],
            out_specs=(tile_spec, part_spec, part_spec, part_spec),
            out_shape=(
                jax.ShapeDtypeStruct((c, d), dtype),
                part_shape, part_shape, part_shape,
            ),
            interpret=interpret,
        )(seed_arr, eps_arr, pos_cd, *tables)

    return traj
