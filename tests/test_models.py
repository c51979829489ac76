"""Distribution golden-value tests.

Mirrors the reference's in-module numeric tests
(/root/reference/src/distributions.rs:572-831): normalized Gaussian log
densities against hand-computed constants, categorical sampling frequencies
vs the pmf, Rosenbrock values and gradients vs finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_mcmc_tpu.models import (
    Categorical,
    binomial_target,
    diffable_gaussian2d,
    gaussian2d,
    isotropic_gaussian_proposal,
    isotropic_gaussian_target,
    poisson_target,
    rosenbrock2d,
    rosenbrock_nd,
)


def test_gaussian2d_normalized_logp_standard():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    # standard bivariate normal at origin: -ln(2 pi)
    lp = target.logp_normalized(jnp.array([0.0, 0.0]))
    assert np.isclose(float(lp), -np.log(2 * np.pi), atol=1e-6)
    # at (1, 0): -ln(2 pi) - 0.5
    lp = target.logp_normalized(jnp.array([1.0, 0.0]))
    assert np.isclose(float(lp), -np.log(2 * np.pi) - 0.5, atol=1e-6)


def test_gaussian2d_unnorm_logp_correlated():
    cov = np.array([[2.0, 0.5], [0.5, 1.0]])
    target = gaussian2d([1.0, -1.0], cov)
    x = np.array([0.3, 0.7])
    diff = x - np.array([1.0, -1.0])
    expected = -0.5 * diff @ np.linalg.inv(cov) @ diff
    assert np.isclose(float(target.logp(jnp.asarray(x))), expected, atol=1e-6)


def test_gaussian_targets_construct_under_trace():
    # Building the targets with TRACED mean/cov (e.g. a jitted
    # hyperparameter sweep) must work: the Pallas-only _dc forms are
    # dropped (they need Python-float coefficients) but every XLA path
    # stays usable.
    @jax.jit
    def logp_at_origin(mean):
        cov = jnp.eye(2)
        t1 = gaussian2d(mean, cov)
        t2 = diffable_gaussian2d(mean, cov)
        assert t1.logp_dc is None and t2.logp_dc is None
        x = jnp.zeros(2)
        return t1.logp(x) + t2.logp(x) + t2.grad(x)[0]

    val = logp_at_origin(jnp.array([1.0, 0.0]))
    expected = -0.5 + (-np.log(2 * np.pi) - 0.5) + 1.0
    assert np.isclose(float(val), expected, atol=1e-6)


def test_diffable_gaussian2d_matches_scipy_logpdf():
    cov = np.array([[4.0, 2.0], [2.0, 3.0]])
    mean = np.array([0.0, 1.0])
    target = diffable_gaussian2d(mean, cov)
    x = np.array([0.5, 2.0])
    diff = x - mean
    expected = (
        -np.log(2 * np.pi)
        - 0.5 * np.log(np.linalg.det(cov))
        - 0.5 * diff @ np.linalg.inv(cov) @ diff
    )
    assert np.isclose(float(target.logp(jnp.asarray(x))), expected, atol=1e-6)
    # batched form agrees
    batch = jnp.asarray(np.stack([x, mean]))
    vals = target.batch_logp(batch)
    assert np.isclose(float(vals[0]), expected, atol=1e-6)
    # analytic gradient matches AD
    g_analytic = target.grad(jnp.asarray(x))
    g_ad = jax.grad(target.logp)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_analytic), np.asarray(g_ad), atol=1e-6)


def test_isotropic_gaussian_target_logp():
    target = isotropic_gaussian_target(2.0)
    x = jnp.array([1.0, 2.0, 3.0])
    expected = -0.5 * (1 + 4 + 9) / 4.0
    assert np.isclose(float(target.logp(x)), expected, atol=1e-6)


def test_isotropic_proposal_symmetric_logq():
    # The reference's normalization quirk is preserved
    # (distributions.rs:379-386); symmetry is what MH relies on.
    prop = isotropic_gaussian_proposal(1.5)
    a = jnp.array([0.0, 1.0])
    b = jnp.array([2.0, -1.0])
    assert np.isclose(float(prop.logp(a, b)), float(prop.logp(b, a)), atol=1e-7)
    var = 1.5**2
    expected = -np.sum((np.array([2.0, -2.0])) ** 2) / (2 * var) - 2 * 0.5 * np.log(
        var * np.pi * var
    )
    assert np.isclose(float(prop.logp(a, b)), expected, atol=1e-5)


def test_isotropic_proposal_sample_distribution():
    prop = isotropic_gaussian_proposal(1.0)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 20000)
    current = jnp.zeros(2)
    samples = jax.vmap(lambda k: prop.sample(k, current))(keys)
    assert abs(float(jnp.mean(samples))) < 0.03
    assert abs(float(jnp.std(samples)) - 1.0) < 0.03


def test_categorical_normalizes_and_samples():
    # Frequencies vs pmf at 100k draws within 1-2%
    # (distributions.rs:667-762).
    cat = Categorical([2.0, 3.0, 5.0])
    np.testing.assert_allclose(np.asarray(cat.probs), [0.2, 0.3, 0.5], atol=1e-7)
    draws = cat.sample(jax.random.PRNGKey(1), (100_000,))
    freqs = np.bincount(np.asarray(draws), minlength=3) / 100_000
    np.testing.assert_allclose(freqs, [0.2, 0.3, 0.5], atol=0.02)
    assert np.isclose(float(cat.logp(1)), np.log(0.3), atol=1e-6)
    assert float(cat.logp(7)) == -np.inf
    assert float(cat.logp(-1)) == -np.inf


def test_rosenbrock2d_logp_and_grad():
    target = rosenbrock2d(1.0, 100.0)
    x = jnp.array([0.5, 1.5])
    expected = -((1.0 - 0.5) ** 2 + 100.0 * (1.5 - 0.25) ** 2)
    assert np.isclose(float(target.logp(x)), expected, atol=1e-5)
    g_analytic = target.grad(x)
    g_ad = jax.grad(target.logp)(x)
    np.testing.assert_allclose(np.asarray(g_analytic), np.asarray(g_ad), rtol=1e-6)


def test_rosenbrock_nd_matches_reference_form():
    target = rosenbrock_nd()
    x = jnp.array([0.5, 1.5, 2.0])
    expected = -(
        100.0 * (1.5 - 0.25) ** 2
        + (1 - 0.5) ** 2
        + 100.0 * (2.0 - 2.25) ** 2
        + (1 - 1.5) ** 2
    )
    assert np.isclose(float(target.logp(x)), expected, atol=1e-5)
    g_analytic = target.grad(x)
    g_ad = jax.grad(target.logp)(x)
    np.testing.assert_allclose(np.asarray(g_analytic), np.asarray(g_ad), rtol=1e-6)
    # batched agrees with vmap
    batch = jnp.stack([x, x * 0.5])
    np.testing.assert_allclose(
        np.asarray(target.logp_batch(batch)),
        np.asarray(jax.vmap(target.logp)(batch)),
        rtol=1e-6,
    )


def test_poisson_target_logp():
    target = poisson_target(4.0)
    lp3 = float(target.logp(jnp.array([3], jnp.int32)))
    expected = 3 * np.log(4.0) - 4.0 - np.log(6.0)
    assert np.isclose(lp3, expected, atol=1e-5)
    assert float(target.logp(jnp.array([-1], jnp.int32))) == -np.inf


def test_binomial_target_logp():
    target = binomial_target(10, 0.3)
    from scipy.stats import binom

    for k in [0, 3, 10]:
        lp = float(target.logp(jnp.array([k], jnp.int32)))
        assert np.isclose(lp, binom.logpmf(k, 10, 0.3), atol=1e-5)
    assert float(target.logp(jnp.array([11], jnp.int32))) == -np.inf


def test_gaussian_random_walk_proposal():
    from mini_mcmc_tpu.models import gaussian_random_walk_proposal

    prop = gaussian_random_walk_proposal([0.5, 2.0])
    a = jnp.array([0.0, 0.0])
    b = jnp.array([0.5, 2.0])
    # symmetric in (from, to)
    assert np.isclose(float(prop.logp(a, b)), float(prop.logp(b, a)), atol=1e-7)
    # correct normalized diagonal-Gaussian density: one-sigma displacement
    expected = (
        -0.5 * 2.0
        - np.log(0.5) - np.log(2.0)
        - np.log(2 * np.pi)
    )
    assert np.isclose(float(prop.logp(a, b)), expected, atol=1e-5)
    # per-dim scales respected in samples
    keys = jax.random.split(jax.random.PRNGKey(0), 20000)
    draws = jax.vmap(lambda k: prop.sample(k, a))(keys)
    np.testing.assert_allclose(
        np.asarray(jnp.std(draws, axis=0)), [0.5, 2.0], rtol=0.05
    )


def test_samplers_reject_1d_initial_positions():
    import pytest

    from mini_mcmc_tpu import NUTS, MetropolisHastings
    from mini_mcmc_tpu.models import isotropic_gaussian_proposal

    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    with pytest.raises(ValueError, match="n_chains, dim"):
        MetropolisHastings(
            target, isotropic_gaussian_proposal(1.0), jnp.zeros(2)
        )
    with pytest.raises(ValueError, match="n_chains, dim"):
        NUTS(target, jnp.zeros(2))


def test_neal_funnel_logp_and_grad():
    from mini_mcmc_tpu.models import neal_funnel

    t = neal_funnel(3.0)
    x = jnp.array([0.5, 1.0, -2.0])
    # hand-computed: -0.5*v^2/9 - 0.5*(1+4)*e^-v - 0.5*2*v
    expected = -0.5 * 0.25 / 9.0 - 0.5 * 5.0 * np.exp(-0.5) - 0.5
    assert np.isclose(float(t.logp(x)), expected, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(t.grad(x)), np.asarray(jax.grad(t.logp)(x)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(t.logp_batch(jnp.stack([x, x * 0.3]))),
        np.asarray(jax.vmap(t.logp)(jnp.stack([x, x * 0.3]))),
        rtol=1e-6,
    )


def test_poisson_target_with_traced_lam_drops_dc_form():
    # built under jit/vmap over hyperparameters, the Pallas coefficients
    # can't be baked in: construction must still succeed with logp_dc=None
    # (use_pallas then raises its clean requirement error), and the XLA
    # path must work
    import jax

    from mini_mcmc_tpu.models import poisson_target

    def build_logp(lam, k):
        t = poisson_target(lam)
        assert t.logp_dc is None
        return t.logp(k)

    out = jax.jit(build_logp)(4.0, jnp.array([3], jnp.int32))
    ref = poisson_target(4.0).logp(jnp.array([3], jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    assert poisson_target(4.0).logp_dc is not None
