"""Fused NUTS subtree-builder Pallas kernel.

The hand-batched XLA tree builder (``ops/nuts.py``) costs ~20 us of XLA
loop/op overhead per leapfrog event at 8,192 chains; this kernel runs an
entire 2^j-leaf subtree — leapfrogs, slice/divergence bookkeeping, the
binary-counter stack, and the progressive proposal merges — inside one
Pallas invocation with the stack resident in VMEM. Algorithmically identical
to ``_build_subtree_batched`` (same binary-counter equivalence to the
reference recursion, /root/reference/src/nuts.rs:763-946).

Merge-swap uniforms come from a counter-based integer hash (murmur3
finalizer over (seed, merge event, chain lane)) rather than the framework's
threefry stream — deterministic and CPU-interpretable, but a different
stream, so this kernel is opt-in (``NUTS(use_pallas=True)``); the momentum,
slice, direction and progressive-acceptance draws stay on the standard
threefry path outside the kernel.

Layout: chains packed onto sublanes and lanes (``[D, 8, C/8]``), like the
HMC kernels. VMEM budget: the stack is ``(max_depth+1) x (4D+2) x C`` f32
(~5 MB for D=2..3, C=8192) plus a few state arrays.
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

#: divergence threshold (nuts.rs:807)
_DELTA = 1000.0


def _mix32(x):
    """murmur3 finalizer on int32 lanes."""
    x = x ^ (x >> 16)
    x = x * jnp.int32(-0x7A143595)  # 0x85EBCA6B
    x = x ^ (x >> 13)
    x = x * jnp.int32(-0x3D4D51CB)  # 0xC2B2AE35
    return x ^ (x >> 16)


def _hash_unit(seed0, seed1, event, lane_id):
    """Counter-based uniform in (0, 1) from the FULL 64-bit step key.

    Both key words enter the state through separate mix rounds: folding the
    key to one 32-bit word first would birthday-collide the per-step
    streams after ~2^16 sampler steps (identical merge-swap draws across
    two steps for every chain) — the exact aliasing the fused HMC/MH
    kernels' seeding policy documents and avoids
    (ops/pallas/hmc_full.py seeding note).
    """
    u24 = _hash_u24(seed0, seed1, event, lane_id)
    return u24.astype(jnp.float32) * (1.0 / 16777216.0) + (1.0 / 33554432.0)


def _hash_u24(seed0, seed1, event, lane_id):
    """The integer stage of :func:`_hash_unit`: 24 hashed bits as int32.

    Split out so the stream's statistics are testable on the exact lattice
    (tests/test_rng_streams.py) — the float32 mapping above rounds the
    +2^-25 midpoint offset, so the lattice index is not recoverable from
    the float."""
    x = lane_id ^ (seed0 + event * jnp.int32(-0x61C88647))  # 0x9E3779B9
    x = _mix32(x)
    x = _mix32(x ^ seed1)
    return (x & jnp.int32(0x7FFFFFFF)) >> 7  # 24 positive bits


def _popcount_i32(x):
    """Scalar popcount via parallel bit-sums (Mosaic has no scalar
    population_count)."""
    x = x - ((x >> 1) & jnp.int32(0x55555555))
    x = (x & jnp.int32(0x33333333)) + ((x >> 2) & jnp.int32(0x33333333))
    x = (x + (x >> 4)) & jnp.int32(0x0F0F0F0F)
    return (x * jnp.int32(0x01010101)) >> 24


def _count_trailing_ones(i):
    x = i + 1
    return _popcount_i32((x & -x) - 1)


#: VMEM budget for the tree stack per grid block (bytes); the rest of the
#: ~16 MB VMEM holds the state arrays and compiler scratch.
_STACK_VMEM_BUDGET = 8 * 1024 * 1024


def _fit_block_c(block_c: int, c: int, d: int, max_depth: int) -> int:
    """Largest 1024-multiple block size that DIVIDES ``c`` and whose
    ``[max_depth+1, 4D+2, 8, bc/8]`` f32 tree stack fits the VMEM budget —
    keeps larger-D targets compiling (with more grid blocks) instead of
    dying on VMEM exhaustion."""
    row_bytes = (max_depth + 1) * (4 * d + 2) * 4
    if row_bytes * 1024 > _STACK_VMEM_BUDGET:
        # Even the minimum 1024-chain block's tree stack exceeds VMEM:
        # fail with a clear message instead of an opaque Mosaic
        # VMEM-exhaustion error (ADVICE r2).
        raise ValueError(
            f"fused NUTS kernels need a [max_depth+1, 4D+2, 8, 128] f32 "
            f"tree stack per 1024-chain block = {row_bytes * 1024} bytes, "
            f"over the {_STACK_VMEM_BUDGET}-byte VMEM budget "
            f"(D={d}, max_depth={max_depth}). Reduce max_depth or use the "
            f"XLA path (use_pallas=False)."
        )
    bc = min(block_c, c, (_STACK_VMEM_BUDGET // row_bytes) // 1024 * 1024)
    bc = max(bc // 1024 * 1024, 1024)
    while bc > 1024 and c % bc:
        bc -= 1024
    return bc


def build_subtree_inkernel(
    stack, grad_dc, logp_dc, draw_uniform, *,
    pos, mom, grad, eps_signed, v_sign, logu, joint0, active, n_leaves,
):
    """The binary-counter subtree body — the SINGLE in-kernel copy of the
    tree math (leapfrog leaves, stack pushes, merge cascade with
    progressive swap, within-subtree U-turn checks; the Pallas analog of
    ``ops/nuts.py::_build_subtree_batched``, nuts.rs:763-946), shared by
    the per-subtree kernel below and the fused full-step kernel
    (``nuts_full.py``).

    Args:
        stack: ``[>= max_height, 4D+2, *lanes]`` f32 VMEM scratch ref.
        draw_uniform: ``(i, k) -> [lanes]`` uniform for the merge swap at
            (leaf ``i``, cascade position ``k``) — the counter hash for
            the per-subtree kernel, the sequential hardware stream for
            the full-step kernel.
        pos/mom/grad: ``[D, *lanes]`` start state VALUES (not refs).
        eps_signed: ``[lanes]`` per-chain signed step (eps * v).
        v_sign: ``[lanes]`` f32 +-1 direction (chronology normalization
            of the U-turn operands).
        logu, joint0, active: ``[lanes]`` slice variable, initial joint,
            and 0/1 live mask.
        n_leaves: traced int32 leaf count (2^j).

    Returns ``(end_pos, end_mom, end_grad, s_run, n_tot, alpha_tot,
    n_alpha_tot, dvg)``; the proposal row is ``stack[0]`` (root) —
    ``[0:D]`` first pos, ``[D:2D]`` first mom, ``[2D:3D]`` proposal pos,
    ``[3D:4D]`` proposal grad, ``[4D]`` proposal logp, ``[4D+1]`` n.

    NaN laundering: the energy difference is scrubbed before ``exp`` —
    callers without early exit keep integrating dead lanes to
    ``inf - inf = NaN`` joints, and the float-masked accumulators compute
    ``0 * NaN = NaN`` (unlike XLA's select). A NaN lane is dead anyway
    (its comparisons are false).
    """
    d = pos.shape[0]
    half = eps_signed * 0.5
    # guaranteed-finite natural-layout fill operand (logu is finite at
    # subtree start); splat constants carry the replicated layout, which
    # is invalid inside while-loop carries (nuts_full.py)
    neg_big = logu * 0.0 - 1e30

    def leaf_body(i, carry):
        pos, mom, grad, s_run, n_tot, alpha_tot, n_alpha_tot, dvg = carry

        # leapfrog (nuts.rs:979-996)
        mom = mom + grad * half[None]
        pos = pos + mom * eps_signed[None]
        grad = grad_dc(pos)
        mom = mom + grad * half[None]
        logp = logp_dc(pos)

        joint = logp - 0.5 * jnp.sum(mom * mom, axis=0)
        n_leaf = (logu < joint).astype(jnp.float32)
        s_leaf = ((logu - _DELTA) < joint).astype(jnp.float32)
        delta = joint - joint0
        delta = jnp.where(delta == delta, delta, neg_big)
        alpha_leaf = jnp.minimum(1.0, jnp.exp(delta))

        live = active * s_run
        n_tot = n_tot + live * n_leaf
        alpha_tot = alpha_tot + live * alpha_leaf
        n_alpha_tot = n_alpha_tot + live
        dvg = jnp.maximum(dvg, live * (1.0 - s_leaf))
        s_run = s_run * s_leaf

        # push leaf row at scalar binary-counter height
        row = jnp.concatenate(
            [pos, mom, pos, grad, logp[None], n_leaf[None]], axis=0
        )
        sp = _popcount_i32(i)
        stack[pl.ds(sp, 1)] = row[None]

        # cascade merges (binary counter)
        n_merges = _count_trailing_ones(i)

        def merge_body(k, mc):
            s_run, top = mc
            ia = sp - 1 - k
            a_row = stack[pl.ds(ia, 1)][0]
            n_a = a_row[4 * d + 1]
            n_b = top[4 * d + 1]
            u = draw_uniform(i, k)
            take_b = u < n_b / jnp.maximum(n_a + n_b, 1.0)

            # U-turn between A.first and the current (last) state,
            # chronology-normalized by v.
            d_chrono = pos - a_row[0:d]
            ok = (
                (v_sign * jnp.sum(d_chrono * a_row[d:2 * d], axis=0))
                >= 0.0
            ) & ((v_sign * jnp.sum(d_chrono * mom, axis=0)) >= 0.0)

            # rank-consistent ([1, ...]-broadcast) selects throughout:
            # rank-2 selects are rejected by Mosaic's layout inference
            # inside while-loop carries (nuts_full.py)
            tb = take_b[None]
            merged = jnp.concatenate(
                [
                    a_row[0:d],
                    a_row[d:2 * d],
                    jnp.where(tb, top[2 * d:3 * d], a_row[2 * d:3 * d]),
                    jnp.where(tb, top[3 * d:4 * d], a_row[3 * d:4 * d]),
                    jnp.where(tb, top[4 * d][None], a_row[4 * d][None]),
                    (n_a + n_b)[None],
                ],
                axis=0,
            )
            stack[pl.ds(ia, 1)] = merged[None]
            s_run = s_run * ok.astype(jnp.float32)
            return s_run, merged

        s_run, _ = lax.fori_loop(0, n_merges, merge_body, (s_run, row))
        return pos, mom, grad, s_run, n_tot, alpha_tot, n_alpha_tot, dvg

    zeros = logu * 0.0
    init = (pos, mom, grad, zeros + 1.0, zeros, zeros, zeros, zeros)
    return lax.fori_loop(0, n_leaves, leaf_body, init)


def make_pallas_subtree(
    grad_dc,
    logp_dc,
    max_depth: int,
    *,
    block_c: int = 8192,
    interpret: bool = False,
):
    """Build the fused subtree function.

    Returns ``subtree(pos, mom, grad [C, D], logu [C], v [C] int32,
    j int32 scalar, eps [C], joint0 [C], active [C] bool, seed int32[2]) ->
    (end_pos, end_mom, end_grad [C, D], prop_pos, prop_grad [C, D],
    prop_logp [C], n [C] i32, s [C] bool, alpha [C], n_alpha [C] i32,
    diverged [C] bool)`` — the `_TreeResult` contract of
    ``ops/nuts.py::_build_subtree_batched``.
    """

    def kernel(j_ref, seed_ref, pos_ref, mom_ref, grad_ref, logu_ref, v_ref,
               eps_ref, joint0_ref, active_ref,
               end_pos_o, end_mom_o, end_grad_o, prop_pos_o, prop_grad_o,
               prop_logp_o, n_o, s_o, alpha_o, n_alpha_o, diverged_o,
               stack):
        d = pos_ref.shape[0]
        lanes = pos_ref.shape[1:]  # (8, bc8)
        j = j_ref[0]
        seed0 = seed_ref[0]
        seed1 = seed_ref[1]
        n_leaves = jnp.int32(1) << j

        eps_signed = eps_ref[:] * v_ref[:]  # [8, bc8]
        logu = logu_ref[:]
        joint0 = joint0_ref[:]
        active = active_ref[:]  # f32 0/1

        lane_id = (
            lax.broadcasted_iota(jnp.int32, lanes, 0) * lanes[1]
            + lax.broadcasted_iota(jnp.int32, lanes, 1)
            + pl.program_id(0) * jnp.int32(lanes[0] * lanes[1])
        )

        (pos, mom, grad, s_run, n_tot, alpha_tot, n_alpha_tot, dvg) = (
            build_subtree_inkernel(
                stack, grad_dc, logp_dc,
                lambda i, k: _hash_unit(
                    seed0, seed1, i * (max_depth + 1) + k, lane_id
                ),
                pos=pos_ref[:], mom=mom_ref[:], grad=grad_ref[:],
                eps_signed=eps_signed, v_sign=v_ref[:], logu=logu,
                joint0=joint0, active=active, n_leaves=n_leaves,
            )
        )

        root = stack[pl.ds(0, 1)][0]
        end_pos_o[:] = pos
        end_mom_o[:] = mom
        end_grad_o[:] = grad
        prop_pos_o[:] = root[2 * d:3 * d]
        prop_grad_o[:] = root[3 * d:4 * d]
        prop_logp_o[:] = root[4 * d]
        n_o[:] = n_tot
        s_o[:] = s_run
        alpha_o[:] = alpha_tot
        n_alpha_o[:] = n_alpha_tot
        diverged_o[:] = dvg

    @functools.partial(jax.jit, static_argnames=())
    def subtree(pos, mom, grad, logu, v, j, eps, joint0, active, seed):
        c, d = pos.shape
        dtype = pos.dtype
        bc = _fit_block_c(block_c, c, d, max_depth)
        if c % bc or bc % 1024:
            raise ValueError(
                f"n_chains={c} must be a multiple of block_c={bc} and 1024"
            )
        grid = (c // bc,)
        shape3 = (d, 8, c // 8)
        lanes = (8, c // 8)
        bc8 = bc // 8

        def pk(x):  # pack [C, D] -> [D, 8, C/8]
            return x.T.reshape(shape3)

        def pkc(x, dt=jnp.float32):  # pack [C] -> [8, C/8]
            return x.astype(dt).reshape(lanes)

        dc_spec = pl.BlockSpec((d, 8, bc8), lambda i: (0, 0, i))
        lp_spec = pl.BlockSpec((8, bc8), lambda i: (0, i))
        if interpret:
            s_spec = pl.BlockSpec((1,), lambda i: (0,))
            seed_spec = pl.BlockSpec((2,), lambda i: (0,))
        else:
            s_spec = pl.BlockSpec((1,), lambda i: (0,),
                                  memory_space=pltpu.SMEM)
            seed_spec = pl.BlockSpec((2,), lambda i: (0,),
                                     memory_space=pltpu.SMEM)

        f32 = jnp.float32
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[s_spec, seed_spec,
                      dc_spec, dc_spec, dc_spec,
                      lp_spec, lp_spec, lp_spec, lp_spec, lp_spec],
            out_specs=(dc_spec, dc_spec, dc_spec, dc_spec, dc_spec,
                       lp_spec, lp_spec, lp_spec, lp_spec, lp_spec, lp_spec),
            out_shape=(
                jax.ShapeDtypeStruct(shape3, dtype),
                jax.ShapeDtypeStruct(shape3, dtype),
                jax.ShapeDtypeStruct(shape3, dtype),
                jax.ShapeDtypeStruct(shape3, dtype),
                jax.ShapeDtypeStruct(shape3, dtype),
                jax.ShapeDtypeStruct(lanes, f32),
                jax.ShapeDtypeStruct(lanes, f32),
                jax.ShapeDtypeStruct(lanes, f32),
                jax.ShapeDtypeStruct(lanes, f32),
                jax.ShapeDtypeStruct(lanes, f32),
                jax.ShapeDtypeStruct(lanes, f32),
            ),
            scratch_shapes=[
                pltpu.VMEM((max_depth + 1, 4 * d + 2, 8, bc // 8), f32),
            ],
            interpret=interpret,
        )(
            jnp.asarray(j, jnp.int32).reshape(1),
            jnp.asarray(seed, jnp.int32).reshape(2),
            pk(pos), pk(mom), pk(grad),
            pkc(logu), pkc(v.astype(f32)), pkc(eps), pkc(joint0),
            pkc(active.astype(f32)),
        )

        def unpk(x):
            return x.reshape(d, c).T

        (end_pos, end_mom, end_grad, prop_pos, prop_grad,
         prop_logp, n, s, alpha, n_alpha, dvg) = outs
        return (
            unpk(end_pos), unpk(end_mom), unpk(end_grad),
            unpk(prop_pos), unpk(prop_grad),
            prop_logp.reshape(c),
            n.reshape(c).astype(jnp.int32),
            s.reshape(c) > 0.5,
            alpha.reshape(c),
            n_alpha.reshape(c).astype(jnp.int32),
            dvg.reshape(c) > 0.5,
        )

    return subtree
