"""MALA sampler + dual-averaging step-size adaptation tests.

MALA is beyond-reference (the reference has no Langevin sampler and never
adapts its HMC step size, /root/reference/src/hmc.rs:36-57); the adaptation
reuses the reference's NUTS dual-averaging constants
(/root/reference/src/nuts.rs:425-430), so the tests pin: the HMC(L=1)
equivalence the implementation relies on, sampling-moment correctness,
convergence of the tuner to the target acceptance rate, and the
reproducibility / continuation contracts shared with every other sampler.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_mcmc_tpu import HMC, MALA, init_det, run_stats
from mini_mcmc_tpu.models import diffable_gaussian2d, standard_normal
from mini_mcmc_tpu.ops.adapt import dual_average_step_size
from mini_mcmc_tpu.ops.hmc import hmc_kernel


def test_mala_shapes_and_type():
    mala = MALA(standard_normal(), init_det(4, 3), step_size=1.0).seed(0)
    sample = mala.run(200, 50)
    assert sample.shape == (4, 200, 3)
    assert isinstance(mala, HMC)  # the documented implementation identity


def test_mala_is_hmc_with_one_leapfrog_bitwise():
    # The class docstring's claim, checked: same seed, same draws.
    target = diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    a = MALA(target, init_det(4, 2), step_size=0.8).seed(7).run(100, 10)
    b = HMC(target, init_det(4, 2), step_size=0.8, n_leapfrog=1,
            unroll=1).seed(7).run(100, 10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mala_gaussian_moments():
    mean = np.array([1.0, 2.0])
    cov = np.array([[4.0, 2.0], [2.0, 3.0]])
    target = diffable_gaussian2d(mean, cov)
    mala = MALA(target, init_det(16, 2), step_size=1.2).seed(42)
    sample = mala.run(3000, 500)
    flat = np.asarray(sample).reshape(-1, 2)
    assert np.all(np.abs(flat.mean(axis=0) - mean) < 0.3), flat.mean(axis=0)
    assert np.max(np.abs(np.cov(flat.T) - cov)) < 0.8, np.cov(flat.T)


def test_mala_seeded_reproducibility():
    target = standard_normal()
    a = MALA(target, init_det(3, 2), step_size=1.0).seed(5).run(50, 0)
    b = MALA(target, init_det(3, 2), step_size=1.0).seed(5).run(50, 0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tuned_reaches_target_acceptance_mala():
    # Start from a hopeless step size (acceptance ~0); the tuner must
    # recover and settle near the MALA optimum 0.574.
    target = standard_normal()
    mala = MALA(target, init_det(256, 4), step_size=25.0).seed(1)
    tuned = mala.tuned(400)
    assert isinstance(tuned, MALA)
    # Measure steady-state acceptance at the tuned eps directly.
    _, alphas = _acceptance_trace(tuned, n_steps=200, seed=2)
    assert abs(float(alphas.mean()) - 0.574) < 0.08, float(alphas.mean())


def test_tuned_reaches_target_acceptance_hmc():
    target = diffable_gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    hmc = HMC(target, init_det(256, 2), step_size=3.0, n_leapfrog=8).seed(3)
    tuned = hmc.tuned(400)
    _, alphas = _acceptance_trace(tuned, n_steps=200, seed=4)
    assert abs(float(alphas.mean()) - 0.651) < 0.08, float(alphas.mean())


def _acceptance_trace(sampler, n_steps: int, seed: int):
    """Mean-acceptance trace at the sampler's OWN step size, via the
    step_eps hook (no adaptation — eps held fixed)."""
    eps = sampler.step_size
    step_eps = sampler._step_fn.step_eps
    key = jax.random.PRNGKey(seed)

    def body(state, k):
        state, alpha = step_eps(state, k, jnp.asarray(eps))
        return state, alpha

    state, alphas = jax.lax.scan(
        body, sampler.state, jax.random.split(key, n_steps))
    return state, np.asarray(alphas)


def test_tuned_scales_with_target_stiffness():
    # A 10x tighter target needs a ~10x smaller step at the same
    # acceptance rate — the tuner must track the scale.
    loose = MALA(standard_normal(), init_det(128, 2), 1.0).seed(0).tuned(300)
    tight_target = diffable_gaussian2d([0.0, 0.0],
                                       [[0.01, 0.0], [0.0, 0.01]])
    tight = MALA(tight_target, init_det(128, 2) * 0.1, 1.0).seed(0).tuned(300)
    ratio = loose.step_size / tight.step_size
    assert 5.0 < ratio < 20.0, ratio


def test_tuned_continues_from_adapted_state():
    target = standard_normal()
    mala = MALA(target, init_det(8, 2) + 50.0, step_size=1.0).seed(9)
    tuned = mala.tuned(300)
    # The adaptation leg's 300 steps must have moved the chains off the
    # distant start toward the typical set.
    assert float(jnp.max(jnp.abs(tuned.positions))) < 25.0
    # Derived key: the workflow is reproducible end-to-end.
    again = (MALA(target, init_det(8, 2) + 50.0, step_size=1.0)
             .seed(9).tuned(300))
    np.testing.assert_array_equal(np.asarray(tuned.positions),
                                  np.asarray(again.positions))
    assert tuned.step_size == again.step_size
    rs = run_stats(tuned.run(500, 100))
    assert 0.9 <= rs.rhat.mean <= 1.1, rs.rhat


def test_tuned_with_metric_round_trip():
    # tuned() on a metric-whitened sampler: positions map back to x-space
    # and the rebuilt sampler keeps the metric.
    target = diffable_gaussian2d([0.0, 0.0], [[4.0, 0.0], [0.0, 0.25]])
    hmc = HMC(target, init_det(64, 2), step_size=0.2, n_leapfrog=8).seed(11)
    hmc.run(200, 0)
    pre = hmc.reconditioned("diag", seed=12)
    tuned = pre.tuned(200)
    assert tuned.metric is pre.metric
    sample = tuned.run(1500, 200)
    flat = np.asarray(sample).reshape(-1, 2)
    assert np.max(np.abs(flat.var(axis=0) - np.array([4.0, 0.25]))) < 0.6, (
        flat.var(axis=0))


def test_warmed_up_full_workflow():
    # tuned -> reconditioned -> tuned on a badly scaled correlated
    # Gaussian: the composed warmup must land a whitened sampler whose
    # acceptance sits at the target and whose draws match the moments.
    cov = np.array([[25.0, 4.0], [4.0, 1.0]])
    target = diffable_gaussian2d([0.0, 0.0], cov)
    mala = MALA(target, init_det(128, 2), step_size=1.0).seed(21)
    ready = mala.warmed_up(300)
    assert isinstance(ready, MALA)
    assert ready.metric is not None
    _, alphas = _acceptance_trace(ready, n_steps=200, seed=22)
    assert abs(float(alphas.mean()) - 0.574) < 0.10, float(alphas.mean())
    sample = ready.run(2000, 200)
    flat = np.asarray(sample).reshape(-1, 2)
    assert np.max(np.abs(np.cov(flat.T) - cov) / np.abs(cov).max()) < 0.1, (
        np.cov(flat.T))
    # end-to-end reproducibility of the composed workflow
    again = (MALA(target, init_det(128, 2), step_size=1.0)
             .seed(21).warmed_up(300))
    assert again.step_size == ready.step_size


def test_dual_average_validates_n_adapt():
    target = standard_normal()
    init_fn, step_fn = hmc_kernel(target, 0.5, 1)
    state = init_fn(init_det(4, 2))
    try:
        dual_average_step_size(step_fn.step_eps, state,
                               jax.random.PRNGKey(0), 0, 0.5, 0.574)
    except ValueError:
        pass
    else:
        raise AssertionError("n_adapt=0 must raise")


def test_step_eps_counts_divergent_proposals_as_zero():
    # A catastrophically large eps produces non-finite proposals; alpha
    # must be 0, not NaN (the tuner would otherwise freeze).
    def logp(x):
        return -jnp.sum(x**4)  # quartic: huge eps overflows fast

    from mini_mcmc_tpu.models.base import Target

    init_fn, step_fn = hmc_kernel(Target(logp=logp), 1e6, 1)
    state = init_fn(init_det(8, 2))
    _, alpha = step_fn.step_eps(state, jax.random.PRNGKey(0),
                                jnp.asarray(1e6))
    assert float(alpha) == 0.0, float(alpha)
