"""NUTS tests.

Mirrors the reference's NUTS test suite (/root/reference/src/nuts.rs:998-1230):
``find_reasonable_epsilon == 2.0`` for a standard normal at the reference's
fixture point, the depth-3 ``build_tree`` golden boundaries (which are
RNG-free because every leaf fails the slice check, so the proposal swap
probabilities are all zero), and statistical moment checks. Golden chain
trajectories are pinned for *our* PRNG (the reference's SmallRng streams are
not reproducible across frameworks by design — SURVEY.md section 7 hard part
c).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_mcmc_tpu import NUTS, init_det, run_stats
from mini_mcmc_tpu.models import (
    diffable_gaussian2d,
    rosenbrock2d,
    standard_normal,
)
from mini_mcmc_tpu.ops.nuts import (
    _build_subtree,
    find_reasonable_epsilon,
)


def test_find_reasonable_epsilon_golden():
    # /root/reference/src/nuts.rs:1050-1055: standard normal,
    # position [0, 1], momentum [1, 0] => exactly 2.0.
    target = standard_normal()
    position = jnp.array([0.0, 1.0], jnp.float64)
    mom = jnp.array([1.0, 0.0], jnp.float64)
    eps = find_reasonable_epsilon(target, position, mom)
    assert float(eps) == 2.0


def test_find_reasonable_epsilon_batch_matches_scalar():
    # The hand-batched search (one masked while over [C, D] tensors) must
    # reproduce the scalar oracle chain-for-chain, including chains that
    # exercise the halving branch (funnel tails go non-finite) and both
    # doubling directions.
    import jax

    from mini_mcmc_tpu.models import neal_funnel, rosenbrock_nd
    from mini_mcmc_tpu.ops.nuts import find_reasonable_epsilon_batch

    for target, scale in [(rosenbrock_nd(), 3.0), (neal_funnel(), 6.0)]:
        key = jax.random.PRNGKey(0)
        kp, km = jax.random.split(key)
        pos = jax.random.normal(kp, (64, 3), jnp.float64) * scale
        mom = jax.random.normal(km, (64, 3), jnp.float64)
        batched = find_reasonable_epsilon_batch(target, pos, mom)
        oracle = jax.vmap(
            lambda p, q: find_reasonable_epsilon(target, p, q)
        )(pos, mom)
        np.testing.assert_allclose(
            np.asarray(batched), np.asarray(oracle), rtol=1e-12
        )
    # and the reference golden still holds through the batched path
    target = standard_normal()
    eps = find_reasonable_epsilon_batch(
        target,
        jnp.array([[0.0, 1.0]], jnp.float64),
        jnp.array([[1.0, 0.0]], jnp.float64),
    )
    assert float(eps[0]) == 2.0


def test_build_tree_golden_deterministic():
    # /root/reference/src/nuts.rs:1057-1121: depth 3, v = -1, all 8 leaves
    # fail the slice check (n' = 0), so boundaries, counts and alpha are
    # deterministic. The reference's 13-tuple maps onto our _TreeResult:
    # position_minus = chronological end (v = -1), position_plus =
    # chronological first leaf; with all n = 0 the proposal stays the first
    # leaf => prop == plus.
    target = diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    position = jnp.array([0.0, 1.0], jnp.float64)
    mom = jnp.array([2.0, 3.0], jnp.float64)
    grad = jnp.array([4.0, 5.0], jnp.float64)
    res = _build_subtree(
        target,
        10,
        position,
        mom,
        grad,
        jnp.float64(-2.0),  # logu
        jnp.int32(-1),  # v
        jnp.int32(3),  # j
        jnp.float64(0.01),  # epsilon
        jnp.float64(0.1),  # joint_0
        jax.random.PRNGKey(0),
    )
    # chronological end == reference position_minus / mom_minus / grad_minus
    np.testing.assert_allclose(
        np.asarray(res.end_pos), [-0.1584001, 0.76208336], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res.end_mom), [1.9800036, 2.9718253], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res.end_grad), [-7.91236e-5, 7.9358295e-2], rtol=1e-4, atol=1e-6
    )
    # proposal == chronological first leaf == reference position_plus
    np.testing.assert_allclose(
        np.asarray(res.prop_pos), [-0.0198, 0.97025], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res.prop_grad), [-1.250e-05, 9.925e-03], rtol=1e-4, atol=1e-7
    )
    assert int(res.n) == 0
    assert bool(res.s)
    assert int(res.n_alpha) == 8
    assert abs(float(res.prop_logp) - (-2.8777454)) < 1e-6
    assert abs(float(res.alpha) - 0.0006866617) < 1e-8


def test_nuts_run_shapes_and_initial_row():
    # With n_discard == 0, row 0 is the initial position (nuts.rs:533-534,
    # test_chain_1 nuts.rs:1138-1152).
    target = diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    init = jnp.array([[0.0, 1.0]])
    sampler = NUTS(target, init, 0.8).seed(42)
    sample = sampler.run(1, 0)
    assert sample.shape == (1, 1, 2)
    np.testing.assert_allclose(np.asarray(sample[0, 0]), [0.0, 1.0], atol=1e-7)


def test_nuts_determinism():
    target = rosenbrock2d(1.0, 100.0)
    a = NUTS(target, init_det(2, 2), 0.8).seed(3).run(20, 10)
    b = NUTS(target, init_det(2, 2), 0.8).seed(3).run(20, 10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nuts_gaussian_moments():
    # Correlated Gaussian: sampled moments approach the target.
    mean = np.array([1.0, 2.0])
    cov = np.array([[1.0, 0.5], [0.5, 2.0]])
    target = diffable_gaussian2d(mean, cov)
    sampler = NUTS(target, init_det(4, 2), 0.8).seed(42)
    sample = sampler.run(1500, 500)
    flat = np.asarray(sample).reshape(-1, 2)
    assert np.all(np.abs(flat.mean(axis=0) - mean) < 0.25), flat.mean(axis=0)
    assert np.max(np.abs(np.cov(flat.T) - cov)) < 0.5, np.cov(flat.T)


def test_nuts_adaptation_reaches_target_accept():
    # Dual averaging should adapt epsilon to something sane (finite,
    # positive, not the sentinel).
    target = standard_normal()
    sampler = NUTS(target, init_det(4, 2), 0.8).seed(1)
    sampler.run(200, 200)
    eps = np.asarray(sampler.state.epsilon)
    assert np.all(np.isfinite(eps)) and np.all(eps > 0.0)
    assert np.all(eps < 100.0)


def test_nuts_divergence_counter():
    # A pathologically large fixed step size forces divergent transitions;
    # the per-chain counter must record them. A well-tuned run stays at 0.
    target = rosenbrock2d(1.0, 100.0)
    sampler = NUTS(target, init_det(4, 2), 0.8).seed(0)
    # bypass adaptation with a huge epsilon
    sampler.state = sampler.state._replace(
        epsilon=jnp.full((4,), 10.0, jnp.float32)
    )
    sampler._prepare_fn = lambda state, key, n_discard: state
    sampler.run(20, 0)
    assert int(jnp.sum(sampler.divergences)) > 0

    # A well-tuned target diverges at most a handful of times during
    # early step-size adaptation (epsilon overshoot is normal warm-up
    # behavior) and not after.
    easy = NUTS(standard_normal(), init_det(4, 2), 0.8).seed(1)
    easy.run(50, 50)
    warmup_div = int(jnp.sum(easy.divergences))
    assert warmup_div <= 8, warmup_div
    before = int(jnp.sum(easy.divergences))
    easy.run(50, 0)  # post-adaptation sampling
    assert int(jnp.sum(easy.divergences)) == before
    # per-run delta: the steady-state run shows ZERO divergences even
    # though the cumulative counter still carries the warmup transient
    assert int(jnp.sum(easy.last_run_divergences)) == 0
    assert int(jnp.sum(easy.divergences)) == warmup_div


def test_nuts_last_run_divergences_is_per_run():
    # fresh sampler: no run yet -> zeros; a forced-divergence run shows in
    # the delta AND the cumulative count; a later clean run resets the
    # delta to 0 while the cumulative count keeps the history
    target = rosenbrock2d(1.0, 100.0)
    sampler = NUTS(target, init_det(4, 2), 0.8).seed(0)
    assert int(jnp.sum(sampler.last_run_divergences)) == 0
    sampler.state = sampler.state._replace(
        epsilon=jnp.full((4,), 10.0, jnp.float32)
    )
    sampler._prepare_fn = lambda state, key, n_discard: state
    sampler.run(20, 0)
    burst = int(jnp.sum(sampler.last_run_divergences))
    assert burst > 0
    assert int(jnp.sum(sampler.divergences)) == burst
    # post-adaptation steps pull epsilon from epsilon_bar; pin both
    sampler.state = sampler.state._replace(
        epsilon=jnp.full((4,), 0.001, jnp.float32),
        epsilon_bar=jnp.full((4,), 0.001, jnp.float32),
    )
    sampler.run(20, 0)
    assert int(jnp.sum(sampler.last_run_divergences)) == 0
    assert int(jnp.sum(sampler.divergences)) == burst


def test_nuts_chain_isolation_under_masking():
    # Lockstep masking correctness: a chain's trajectory must be invariant
    # to what the OTHER chains do (here: chain 1 forced into immediate
    # divergence with a huge per-chain epsilon). Chains share only loop
    # *iteration counts*; all per-chain effects are masked, so chain 0's
    # draws and decisions are identical in both runs.
    target = diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    init = jnp.array([[0.3, 1.2], [0.5, -0.4]], jnp.float32)

    def run_with_eps1(eps1):
        s = NUTS(target, init, 0.8).seed(9)
        s.state = s.state._replace(
            epsilon=jnp.array([0.5, eps1], jnp.float32)
        )
        s._prepare_fn = lambda state, key, n_discard: state._replace(
            n_discard=jnp.zeros((2,), jnp.int32)
        )
        return np.asarray(s.run(8, 0))

    normal = run_with_eps1(0.5)
    partner_diverges = run_with_eps1(1e6)
    np.testing.assert_array_equal(normal[0], partner_diverges[0])


def test_nuts_rhat_band():
    target = diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    sampler = NUTS(target, init_det(3, 2), 0.8).seed(5)
    sample = sampler.run(800, 300)
    rs = run_stats(sample)
    assert 0.9 <= rs.rhat.mean <= 1.1, rs.rhat
    assert rs.ess.min > 100.0, rs.ess


def test_warmup_max_depth_validation_and_effect():
    import pytest

    target = diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    with pytest.raises(ValueError, match="warmup_max_depth"):
        NUTS(target, init_det(2, 2), 0.8, warmup_max_depth=0)
    with pytest.raises(ValueError, match="warmup_max_depth"):
        NUTS(target, init_det(2, 2), 0.8, max_depth=6, warmup_max_depth=7)
    # A valid cap still samples the target correctly.
    s = NUTS(target, init_det(4, 2), 0.8, warmup_max_depth=4).seed(11)
    flat = np.asarray(s.run(600, 300)).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 1.0], atol=0.3)


def test_nuts_funnel_produces_divergences():
    # Neal's funnel neck is the canonical divergence generator; the
    # diagnostics must light up where geometry breaks the integrator.
    from mini_mcmc_tpu.models import neal_funnel

    s = NUTS(neal_funnel(3.0), init_det(8, 4), 0.8).seed(2)
    sample = s.run(300, 300)
    assert int(jnp.sum(s.divergences)) > 0
    # the v-marginal should still be roughly centered (funnel is hard, so
    # only a loose sanity check)
    v = np.asarray(sample[:, :, 0]).ravel()
    assert abs(v.mean()) < 1.5, v.mean()


def test_nuts_time_major_layout_is_pure_transpose():
    # the initial-recording runner's time_major=True must change ONLY the
    # layout: same draws, bit-exact, for both collection conventions
    target = diffable_gaussian2d([0.0, 1.0], [[1.0, 0.0], [0.0, 1.0]])
    for n_discard in (0, 20):
        cm = NUTS(target, init_det(4, 2), 0.5).seed(7).run(30, n_discard)
        tm = NUTS(target, init_det(4, 2), 0.5).seed(7).run(
            30, n_discard, time_major=True
        )
        assert tm.shape == (30, 4, 2)
        np.testing.assert_array_equal(
            np.asarray(tm), np.asarray(jnp.swapaxes(cm, 0, 1))
        )


def test_nuts_leapfrog_accounting():
    """The executed-leapfrog counter (lockstep-cost accounting): every
    lane pays the same 2^J - 1 gradient evals per step, so the counter is
    identical across chains, grows monotonically, and its per-run delta
    follows the last_run_divergences convention."""
    target = diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    s = NUTS(target, init_det(8, 2), 0.8).seed(3)
    assert np.all(np.asarray(s.leapfrogs) == 0)
    assert np.all(np.asarray(s.last_run_leapfrogs) == 0)

    s.run(40, 10)
    lf1 = np.asarray(s.leapfrogs)
    # lockstep: one shared cost for all lanes; at least 1 leapfrog per
    # step (49 steps: initial-recording convention)
    assert np.all(lf1 == lf1[0])
    assert lf1[0] >= 49
    np.testing.assert_array_equal(np.asarray(s.last_run_leapfrogs), lf1)

    s.run(40, 0)
    lf2 = np.asarray(s.leapfrogs)
    assert lf2[0] > lf1[0]
    np.testing.assert_array_equal(
        np.asarray(s.last_run_leapfrogs), lf2 - lf1
    )
    # grad-evals/draw is the ChEES-comparison number: bounded by the
    # 2^max_depth tree cap
    per_draw = (lf2[0] - lf1[0]) / 39
    assert 1.0 <= per_draw <= 2.0**10, per_draw


def test_leapfrog_counter_saturates_instead_of_wrapping():
    """ADVICE r4: the int32 cumulative counter must saturate at
    _LEAPFROG_SAT, not wrap negative (a wrap would sticky-pin the -1
    'unavailable' sentinel on long production runs)."""
    from mini_mcmc_tpu.ops.nuts import _LEAPFROG_SAT, NUTSState, _finish_step

    def state_with(lf):
        c = 4
        f = jnp.float32
        return NUTSState(
            positions=jnp.zeros((c, 2), f),
            epsilon=jnp.full((c,), 0.5, f),
            epsilon_bar=jnp.ones((c,), f),
            h_bar=jnp.zeros((c,), f),
            mu=jnp.zeros((c,), f),
            m=jnp.full((c,), 5, jnp.int32),
            n_discard=jnp.zeros((c,), jnp.int32),
            divergences=jnp.zeros((c,), jnp.int32),
            leapfrogs=jnp.full((c,), lf, jnp.int32),
        )

    def bump(state, inc):
        c = state.positions.shape[0]
        out = _finish_step(
            state, 0.8, state.m + 1, state.positions,
            jnp.ones((c,), jnp.float32), jnp.ones((c,), jnp.int32),
            jnp.zeros((c,), bool), leapfrog_inc=jnp.int32(inc),
        )
        return np.asarray(out.leapfrogs)

    # normal accumulation far from the ceiling
    assert np.all(bump(state_with(100), 1023) == 1123)
    # one increment below the ceiling: clamps to the ceiling, stays >= 0
    near = _LEAPFROG_SAT - 10
    assert np.all(bump(state_with(near), 1023) == _LEAPFROG_SAT)
    # at the ceiling: stays pinned (no wrap, no negative)
    assert np.all(bump(state_with(_LEAPFROG_SAT), 1023) == _LEAPFROG_SAT)
    # the -1 'unknown history' sentinel stays -1
    assert np.all(bump(state_with(-1), 1023) == -1)
    # per-chain [C] increments (the fused kernel's form) accumulate too
    c_state = state_with(10)
    out = _finish_step(
        c_state, 0.8, c_state.m + 1, c_state.positions,
        jnp.ones((4,), jnp.float32), jnp.ones((4,), jnp.int32),
        jnp.zeros((4,), bool),
        leapfrog_inc=jnp.array([1, 3, 7, 15], jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(out.leapfrogs),
                                  [11, 13, 17, 25])
