"""No-U-Turn Sampler step kernel (iterative, lockstep-batched).

TPU-native redesign of the reference's recursive NUTS
(/root/reference/src/nuts.rs:550-996, Hoffman & Gelman Algorithm 6 with
slice sampling and dual-averaging adaptation). The reference recursion is
data-dependent per chain and runs one chain per OS thread; that cannot map
to XLA. Here the recursion is replaced by an *iterative binary-counter tree
builder* that is exactly equivalent:

- ``build_tree(.., j)`` processes its 2^j leapfrog states chronologically;
  the recursion's bottom-up merges are the merges of a binary counter (after
  leaf ``i``, merge ``count_trailing_ones(i)`` times), so subtree boundaries,
  U-turn checks, slice counts ``n'``, divergence flags and the progressive
  proposal swaps (right subtree wins with probability ``n2 / max(n1+n2, 1)``,
  nuts.rs:910-915) happen in the same order with the same operands.
- Early termination (divergence / sub-U-turn) stops leaf processing exactly
  where the recursion stops expanding; the partially built tree's remaining
  unequal-size merges only affect fields that are unused when ``s = false``
  (boundaries, proposal), while ``n'``/``alpha`` totals are running sums —
  so they are skipped without behavioral difference.
- Per-chain stacks are fixed ``[max_depth+1, D]`` buffers; the whole step is
  a ``lax.while_loop`` nest that ``vmap`` runs in lockstep across chains
  (inactive lanes masked by JAX's batched-while lowering).

Deviation from the reference: the reference has *no* tree-depth cap
(nuts.rs:578-674); a fixed ``max_depth`` (default 10, Stan's default) is
required for bounded lockstep execution.

Dual averaging uses the reference constants gamma=0.05, t_0=10, kappa=0.75,
mu=ln(10*eps), epsilon_bar=1, h_bar=0 (nuts.rs:425-430) and the lazy
``find_reasonable_epsilon`` initialization (nuts.rs:540-543, :694-761).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.base import Target

# Dual-averaging constants (nuts.rs:425-430)
GAMMA = 0.05
T_0 = 10.0
KAPPA = 0.75
#: divergence threshold: s' = (logu - 1000) < joint (nuts.rs:807)
DIVERGENCE_DELTA = 1000.0
#: safety cap for find_reasonable_epsilon loops (reference is uncapped)
_FIND_EPS_MAX_ITERS = 100


class NUTSState(NamedTuple):
    """Batched NUTS chain state (leaves have leading chains axis)."""

    positions: jax.Array  # [C, D]
    epsilon: jax.Array  # [C] current step size (-1.0 sentinel = auto)
    epsilon_bar: jax.Array  # [C] averaged step size
    h_bar: jax.Array  # [C] dual-averaging error statistic
    mu: jax.Array  # [C] ln(10 * epsilon_0)
    m: jax.Array  # [C] int32 cumulative step count
    n_discard: jax.Array  # [C] int32 adaptation horizon of the current run


def _leapfrog1(target: Target, pos, mom, grad, eps):
    """Single leapfrog step on one chain (nuts.rs:979-996)."""
    mom = mom + grad * (eps * 0.5)
    pos = pos + mom * eps
    logp, grad = target.logp_and_grad(pos)
    mom = mom + grad * (eps * 0.5)
    return pos, mom, grad, logp


def _all_real(x) -> jax.Array:
    """True iff no NaN/Inf anywhere (nuts.rs:948-961)."""
    return jnp.logical_not(jnp.any(jnp.isinf(x) | jnp.isnan(x)))


def find_reasonable_epsilon(target: Target, position, mom):
    """Step-size heuristic (nuts.rs:694-761), per chain.

    Halve a trial multiplier until the first leapfrog is finite, set
    ``eps = 0.5 * k``, then double (or halve) until the acceptance
    probability crosses 1/2. Faithful to the reference's quirks: the
    finiteness loop requires both logp *and* grad non-real to continue
    (``&&`` of two negations, nuts.rs:717), and the result is
    ``0.5 * k * eps`` even when the loop never runs (so the search starts at
    0.5).
    """
    dtype = position.dtype
    one = jnp.asarray(1.0, dtype)
    logp0, grad0 = target.logp_and_grad(position)
    ke0 = 0.5 * jnp.sum(mom * mom)

    def lf(eps):
        _, mom_p, grad_p, logp_p = _leapfrog1(target, position, mom, grad0, eps)
        return mom_p, grad_p, logp_p

    mom_p, grad_p, logp_p = lf(one)

    def halve_cond(carry):
        k, mom_p, grad_p, logp_p, it = carry
        bad = jnp.logical_not(_all_real(logp_p)) & jnp.logical_not(
            _all_real(grad_p)
        )
        return bad & (it < _FIND_EPS_MAX_ITERS)

    def halve_body(carry):
        k, mom_p, grad_p, logp_p, it = carry
        k = k * 0.5
        mom_p, grad_p, logp_p = lf(k)  # epsilon * k with epsilon == 1
        return k, mom_p, grad_p, logp_p, it + 1

    k, mom_p, grad_p, logp_p, _ = lax.while_loop(
        halve_cond, halve_body, (one, mom_p, grad_p, logp_p, jnp.int32(0))
    )

    epsilon = 0.5 * k
    log_accept = logp_p - logp0 - (0.5 * jnp.sum(mom_p * mom_p) - ke0)
    ln2 = jnp.asarray(jnp.log(2.0), dtype)
    a = jnp.where(log_accept > -ln2, one, -one)  # ln(0.5) = -ln2

    def dbl_cond(carry):
        epsilon, log_accept, it = carry
        return (a * log_accept > -a * ln2) & (it < _FIND_EPS_MAX_ITERS)

    def dbl_body(carry):
        epsilon, log_accept, it = carry
        epsilon = epsilon * jnp.power(jnp.asarray(2.0, dtype), a)
        mom_p, _, logp_p = lf(epsilon)
        log_accept = logp_p - logp0 - (0.5 * jnp.sum(mom_p * mom_p) - ke0)
        return epsilon, log_accept, it + 1

    epsilon, _, _ = lax.while_loop(
        dbl_cond, dbl_body, (epsilon, log_accept, jnp.int32(0))
    )
    return epsilon


def _count_trailing_ones(i):
    """Number of trailing 1-bits of ``i`` = ctz(i+1)."""
    x = i + 1
    return lax.population_count((x & -x) - 1)


class _TreeResult(NamedTuple):
    end_pos: jax.Array
    end_mom: jax.Array
    end_grad: jax.Array
    prop_pos: jax.Array
    prop_grad: jax.Array
    prop_logp: jax.Array
    n: jax.Array  # int32 slice-passing count
    s: jax.Array  # bool: no divergence / no sub-U-turn
    alpha: jax.Array
    n_alpha: jax.Array  # int32


def _uturn_ok(d_chrono, mom_first, mom_last, v):
    """Chronology-normalized U-turn criterion (nuts.rs:963-977): with
    ``diff = pos_plus - pos_minus = v * d_chrono``, both boundary momenta
    must have non-negative dot products with ``diff``."""
    vf = v.astype(d_chrono.dtype)
    return (vf * jnp.dot(d_chrono, mom_first) >= 0) & (
        vf * jnp.dot(d_chrono, mom_last) >= 0
    )


def _build_subtree(
    target: Target,
    max_depth: int,
    pos,
    mom,
    grad,
    logu,
    v,
    j,
    epsilon,
    joint_0,
    key,
) -> _TreeResult:
    """Iteratively build the 2^j-leaf subtree grown from ``(pos, mom, grad)``
    in direction ``v`` (equivalent to the recursion at nuts.rs:763-946).

    All arguments are single-chain; the caller vmaps. ``j`` is a traced
    int32 (dynamic depth), bounded by the static ``max_depth``.
    """
    dtype = pos.dtype
    dim = pos.shape[0]
    stack_n = max_depth + 1

    n_leaves = jnp.int32(1) << j
    eps_signed = epsilon * v.astype(dtype)

    def cond(carry):
        (i, *_rest, s_run, _key) = carry
        return (i < n_leaves) & s_run

    def body(carry):
        (
            i,
            cur_pos,
            cur_mom,
            cur_grad,
            st_first_pos,
            st_first_mom,
            st_n,
            st_prop_pos,
            st_prop_grad,
            st_prop_logp,
            sp,
            n_tot,
            alpha_tot,
            n_alpha_tot,
            s_run,
            key,
        ) = carry

        # --- leaf: one leapfrog step (base case, nuts.rs:795-830) ---------
        cur_pos, cur_mom, cur_grad, logp = _leapfrog1(
            target, cur_pos, cur_mom, cur_grad, eps_signed
        )
        joint = logp - 0.5 * jnp.sum(cur_mom * cur_mom)
        n_leaf = (logu < joint).astype(jnp.int32)
        s_leaf = (logu - DIVERGENCE_DELTA) < joint
        alpha_leaf = jnp.minimum(jnp.asarray(1.0, dtype), jnp.exp(joint - joint_0))

        st_first_pos = st_first_pos.at[sp].set(cur_pos)
        st_first_mom = st_first_mom.at[sp].set(cur_mom)
        st_n = st_n.at[sp].set(n_leaf)
        st_prop_pos = st_prop_pos.at[sp].set(cur_pos)
        st_prop_grad = st_prop_grad.at[sp].set(cur_grad)
        st_prop_logp = st_prop_logp.at[sp].set(logp)
        sp = sp + 1

        n_tot = n_tot + n_leaf
        alpha_tot = alpha_tot + alpha_leaf
        n_alpha_tot = n_alpha_tot + 1
        s_run = s_run & s_leaf

        # --- cascade merges: binary counter (recursion merges,
        #     nuts.rs:858-929) --------------------------------------------
        n_merges = _count_trailing_ones(i)

        def merge_cond(mc):
            (merges_left, *_r) = mc
            return merges_left > 0

        def merge_body(mc):
            (
                merges_left,
                st_first_pos,
                st_first_mom,
                st_n,
                st_prop_pos,
                st_prop_grad,
                st_prop_logp,
                sp,
                s_run,
                key,
            ) = mc
            ia = sp - 2
            ib = sp - 1
            n_a = st_n[ia]
            n_b = st_n[ib]
            key, k_swap = jax.random.split(key)
            u = jax.random.uniform(k_swap, (), dtype)
            take_b = u < n_b.astype(dtype) / jnp.maximum(n_a + n_b, 1).astype(
                dtype
            )
            prop_pos = jnp.where(take_b, st_prop_pos[ib], st_prop_pos[ia])
            prop_grad = jnp.where(take_b, st_prop_grad[ib], st_prop_grad[ia])
            prop_logp = jnp.where(take_b, st_prop_logp[ib], st_prop_logp[ia])

            # U-turn between merged subtree's chronological boundaries:
            # first = A.first, last = current integration state.
            d = cur_pos - st_first_pos[ia]
            s_merge = _uturn_ok(d, st_first_mom[ia], cur_mom, v)

            st_n = st_n.at[ia].set(n_a + n_b)
            st_prop_pos = st_prop_pos.at[ia].set(prop_pos)
            st_prop_grad = st_prop_grad.at[ia].set(prop_grad)
            st_prop_logp = st_prop_logp.at[ia].set(prop_logp)
            sp = sp - 1
            s_run = s_run & s_merge
            return (
                merges_left - 1,
                st_first_pos,
                st_first_mom,
                st_n,
                st_prop_pos,
                st_prop_grad,
                st_prop_logp,
                sp,
                s_run,
                key,
            )

        (
            _,
            st_first_pos,
            st_first_mom,
            st_n,
            st_prop_pos,
            st_prop_grad,
            st_prop_logp,
            sp,
            s_run,
            key,
        ) = lax.while_loop(
            merge_cond,
            merge_body,
            (
                n_merges,
                st_first_pos,
                st_first_mom,
                st_n,
                st_prop_pos,
                st_prop_grad,
                st_prop_logp,
                sp,
                s_run,
                key,
            ),
        )

        return (
            i + 1,
            cur_pos,
            cur_mom,
            cur_grad,
            st_first_pos,
            st_first_mom,
            st_n,
            st_prop_pos,
            st_prop_grad,
            st_prop_logp,
            sp,
            n_tot,
            alpha_tot,
            n_alpha_tot,
            s_run,
            key,
        )

    init = (
        jnp.int32(0),
        pos,
        mom,
        grad,
        jnp.zeros((stack_n, dim), dtype),
        jnp.zeros((stack_n, dim), dtype),
        jnp.zeros((stack_n,), jnp.int32),
        jnp.zeros((stack_n, dim), dtype),
        jnp.zeros((stack_n, dim), dtype),
        jnp.zeros((stack_n,), dtype),
        jnp.int32(0),
        jnp.int32(0),
        jnp.asarray(0.0, dtype),
        jnp.int32(0),
        jnp.asarray(True),
        key,
    )
    (
        _i,
        cur_pos,
        cur_mom,
        cur_grad,
        st_first_pos,
        st_first_mom,
        st_n,
        st_prop_pos,
        st_prop_grad,
        st_prop_logp,
        _sp,
        n_tot,
        alpha_tot,
        n_alpha_tot,
        s_run,
        _key,
    ) = lax.while_loop(cond, body, init)

    return _TreeResult(
        end_pos=cur_pos,
        end_mom=cur_mom,
        end_grad=cur_grad,
        prop_pos=st_prop_pos[0],
        prop_grad=st_prop_grad[0],
        prop_logp=st_prop_logp[0],
        n=n_tot,
        s=s_run,
        alpha=alpha_tot,
        n_alpha=n_alpha_tot,
    )


def _nuts_chain_step(
    target: Target,
    target_accept_p: float,
    max_depth: int,
    position,
    epsilon,
    epsilon_bar,
    h_bar,
    mu,
    m,
    n_discard,
    key,
):
    """One NUTS update for a single chain (nuts.rs:550-691); vmapped by the
    batched kernel."""
    dtype = position.dtype
    one = jnp.asarray(1.0, dtype)
    key_mom, key_exp, key_loop = jax.random.split(key, 3)

    mom_0 = jax.random.normal(key_mom, position.shape, dtype)
    logp, grad = target.logp_and_grad(position)
    joint = logp - 0.5 * jnp.sum(mom_0 * mom_0)
    logu = joint - jax.random.exponential(key_exp, (), dtype)

    def cond(carry):
        (_pos_m, _mom_m, _grad_m, _pos_p, _mom_p, _grad_p, _sel, j, _n, s,
         _alpha, _n_alpha, _key) = carry
        return s & (j < max_depth)

    def body(carry):
        (
            pos_minus,
            mom_minus,
            grad_minus,
            pos_plus,
            mom_plus,
            grad_plus,
            position_sel,
            j,
            n,
            s,
            alpha,
            n_alpha,
            key,
        ) = carry
        key, k_v, k_acc, k_tree = jax.random.split(key, 4)
        v = jnp.where(
            jax.random.uniform(k_v, (), dtype) < 0.5, jnp.int32(-1), jnp.int32(1)
        )

        start_pos = jnp.where(v == -1, pos_minus, pos_plus)
        start_mom = jnp.where(v == -1, mom_minus, mom_plus)
        start_grad = jnp.where(v == -1, grad_minus, grad_plus)

        res = _build_subtree(
            target, max_depth, start_pos, start_mom, start_grad,
            logu, v, j, epsilon, joint, k_tree,
        )

        neg = v == -1
        pos_minus = jnp.where(neg, res.end_pos, pos_minus)
        mom_minus = jnp.where(neg, res.end_mom, mom_minus)
        grad_minus = jnp.where(neg, res.end_grad, grad_minus)
        pos_plus = jnp.where(neg, pos_plus, res.end_pos)
        mom_plus = jnp.where(neg, mom_plus, res.end_mom)
        grad_plus = jnp.where(neg, grad_plus, res.end_grad)

        # Progressive acceptance: u < min(1, n'/n) (nuts.rs:656-663).
        ratio = res.n.astype(dtype) / n.astype(dtype)
        u2 = jax.random.uniform(k_acc, (), dtype)
        take = res.s & (u2 < jnp.minimum(one, ratio))
        position_sel = jnp.where(take, res.prop_pos, position_sel)

        n = n + res.n
        d = pos_plus - pos_minus
        no_uturn = (jnp.dot(d, mom_minus) >= 0) & (jnp.dot(d, mom_plus) >= 0)
        s = res.s & no_uturn
        return (
            pos_minus, mom_minus, grad_minus,
            pos_plus, mom_plus, grad_plus,
            position_sel, j + 1, n, s, res.alpha, res.n_alpha, key,
        )

    init = (
        position, mom_0, grad,
        position, mom_0, grad,
        position, jnp.int32(0), jnp.int32(1), jnp.asarray(True),
        jnp.asarray(0.0, dtype), jnp.int32(0), key_loop,
    )
    (_pm, _mm, _gm, _pp, _mp, _gp, position_sel, _j, _n, _s, alpha, n_alpha,
     _key) = lax.while_loop(cond, body, init)

    # Dual averaging (nuts.rs:676-691); m was incremented by the caller.
    mf = m.astype(dtype)
    eta = one / (mf + T_0)
    h_bar = (1.0 - eta) * h_bar + eta * (
        target_accept_p - alpha / jnp.maximum(n_alpha, 1).astype(dtype)
    )
    warming = m <= n_discard
    eps_warm = jnp.exp(mu - jnp.sqrt(mf) / GAMMA * h_bar)
    eta2 = jnp.power(mf, -KAPPA)
    eps_bar_warm = jnp.exp(
        (1.0 - eta2) * jnp.log(epsilon_bar) + eta2 * jnp.log(eps_warm)
    )
    epsilon = jnp.where(warming, eps_warm, epsilon_bar)
    epsilon_bar = jnp.where(warming, eps_bar_warm, epsilon_bar)

    return position_sel, epsilon, epsilon_bar, h_bar


def nuts_kernel(target: Target, target_accept_p: float, max_depth: int = 10):
    """Build ``(init_fn, prepare_fn, step_fn)`` for batched NUTS.

    ``init_fn(positions [C, D]) -> NUTSState`` (epsilon sentinel = -1,
    matching nuts.rs:415-433).
    ``prepare_fn(state, key, n_discard) -> NUTSState`` runs
    ``find_reasonable_epsilon`` for sentinel chains and resets
    ``mu = ln(10 * eps)`` (init_chain, nuts.rs:528-545).
    ``step_fn(state, key) -> NUTSState``.
    """

    def init_fn(positions: jax.Array) -> NUTSState:
        positions = jnp.asarray(positions)
        c = positions.shape[0]
        dtype = positions.dtype
        return NUTSState(
            positions=positions,
            epsilon=jnp.full((c,), -1.0, dtype),
            epsilon_bar=jnp.ones((c,), dtype),
            h_bar=jnp.zeros((c,), dtype),
            mu=jnp.full((c,), jnp.log(10.0), dtype),
            m=jnp.zeros((c,), jnp.int32),
            n_discard=jnp.zeros((c,), jnp.int32),
        )

    def prepare_fn(state: NUTSState, key: jax.Array, n_discard: int) -> NUTSState:
        c = state.positions.shape[0]
        dtype = state.positions.dtype
        mom_0 = jax.random.normal(key, state.positions.shape, dtype)
        eps_found = jax.vmap(lambda p, q: find_reasonable_epsilon(target, p, q))(
            state.positions, mom_0
        )
        sentinel = jnp.abs(state.epsilon + 1.0) <= jnp.finfo(dtype).eps
        epsilon = jnp.where(sentinel, eps_found, state.epsilon)
        mu = jnp.log(10.0 * epsilon)
        return state._replace(
            epsilon=epsilon,
            mu=mu,
            n_discard=jnp.full((c,), n_discard, jnp.int32),
        )

    def step_fn(state: NUTSState, key: jax.Array) -> NUTSState:
        c = state.positions.shape[0]
        chain_keys = jax.random.split(key, c)
        m = state.m + 1  # reference increments at step start (nuts.rs:551)
        positions, epsilon, epsilon_bar, h_bar = jax.vmap(
            lambda pos, eps, eps_bar, hb, mu, mm, nd, k: _nuts_chain_step(
                target, target_accept_p, max_depth,
                pos, eps, eps_bar, hb, mu, mm, nd, k,
            )
        )(
            state.positions,
            state.epsilon,
            state.epsilon_bar,
            state.h_bar,
            state.mu,
            m,
            state.n_discard,
            chain_keys,
        )
        return NUTSState(
            positions=positions,
            epsilon=epsilon,
            epsilon_bar=epsilon_bar,
            h_bar=h_bar,
            mu=state.mu,
            m=m,
            n_discard=state.n_discard,
        )

    return init_fn, prepare_fn, step_fn
