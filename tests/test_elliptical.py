"""Elliptical slice sampler tests (beyond-reference capability).

Conjugate Gaussian-likelihood posteriors have closed forms, so the
sharpest checks are analytic: posterior moments for scalar and correlated
priors, one-step stationarity by KS from an exact posterior sample, and a
cross-sampler consistency check against ``SliceSampler`` on the same
(non-conjugate) posterior. Plus prior-only ergodicity with a flat
likelihood, determinism, the block path, and bit-exact checkpoint resume.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

from mini_mcmc_tpu import (
    EllipticalSliceSampler,
    SliceSampler,
    init_with_seed,
    split_rhat_mean_ess,
)
from mini_mcmc_tpu.checkpoint import restore_sampler, save_sampler
from mini_mcmc_tpu.models.base import Target


def _gauss_lik(mean, std):
    mean = jnp.asarray(mean)
    return Target(
        logp=lambda x: -0.5 * jnp.sum(((x - mean) / std) ** 2)
    )


def test_shape_contract_and_runner():
    lik = _gauss_lik([0.0, 0.0], 1.0)
    es = EllipticalSliceSampler(lik, init_with_seed(4, 2, seed=0)).seed(1)
    sample = es.run(50, 10)
    assert sample.shape == (4, 50, 2)
    assert es.positions.shape == (4, 2)


def test_conjugate_posterior_moments():
    # Prior N(0, sigma^2 I), likelihood N(x; m, s^2 I): posterior is
    # Gaussian with precision 1/sigma^2 + 1/s^2.
    sigma, s, m = 2.0, 1.0, jnp.array([1.0, -2.0])
    prec = 1.0 / sigma**2 + 1.0 / s**2
    post_var = 1.0 / prec
    post_mean = (m / s**2) * post_var
    es = EllipticalSliceSampler(
        _gauss_lik(m, s), init_with_seed(64, 2, seed=1), prior_scale=sigma
    ).seed(2)
    flat = np.asarray(es.run(1500, 300)).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), post_mean, atol=0.05)
    np.testing.assert_allclose(
        flat.var(axis=0), [post_var, post_var], rtol=0.08
    )


def test_correlated_prior_cholesky_flat_likelihood():
    # With a flat likelihood the chain must be ergodic for the PRIOR
    # itself; a correlated [D, D] Cholesky exercises the matmul path.
    cov = jnp.array([[4.0, 2.0], [2.0, 3.0]])
    chol = jnp.linalg.cholesky(cov)
    flat_lik = Target(logp=lambda x: jnp.zeros(()))
    es = EllipticalSliceSampler(
        flat_lik, init_with_seed(64, 2, seed=2), prior_scale=chol
    ).seed(3)
    flat = np.asarray(es.run(1500, 300)).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(np.cov(flat.T), cov, rtol=0.1, atol=0.1)


def test_stationarity_one_step_ks():
    # Exact posterior sample -> one update -> still the posterior.
    sigma, s, mval = 1.5, 0.8, 0.7
    prec = 1.0 / sigma**2 + 1.0 / s**2
    post_std = prec**-0.5
    post_mean = (mval / s**2) / prec
    n = 4096
    exact = post_mean + post_std * jax.random.normal(
        jax.random.PRNGKey(11), (n, 1)
    )
    es = EllipticalSliceSampler(
        _gauss_lik([mval], s), exact, prior_scale=sigma
    ).seed(4)
    out = np.asarray(es.run(1, 0))[:, 0, 0]
    ks = sps.kstest(out, "norm", args=(post_mean, post_std))
    assert ks.pvalue > 0.01, ks


def test_nonzero_prior_mean():
    # Prior N(mu, sigma^2), flat likelihood: samples the shifted prior.
    flat_lik = Target(logp=lambda x: jnp.zeros(()))
    es = EllipticalSliceSampler(
        flat_lik, init_with_seed(32, 1, seed=3),
        prior_mean=5.0, prior_scale=0.5,
    ).seed(5)
    flat = np.asarray(es.run(1200, 200)).reshape(-1)
    np.testing.assert_allclose(flat.mean(), 5.0, atol=0.05)
    np.testing.assert_allclose(flat.var(), 0.25, rtol=0.1)


def test_cross_sampler_consistency_non_gaussian_lik():
    # Bernoulli-probit-style likelihood (non-conjugate): elliptical slice
    # on (prior, lik) must agree with coordinate slice on the full
    # posterior logp.
    y = jnp.array([1.0, -1.0, 1.0])

    def loglik_fn(x):
        return jnp.sum(jax.nn.log_sigmoid(3.0 * y * x))

    lik = Target(logp=loglik_fn)
    full = Target(logp=lambda x: -0.5 * jnp.sum(x * x) + loglik_fn(x))
    es = EllipticalSliceSampler(
        lik, init_with_seed(48, 3, seed=4)
    ).seed(6)
    ss = SliceSampler(full, init_with_seed(48, 3, seed=5)).seed(7)
    a = np.asarray(es.run(2500, 500)).reshape(-1, 3)
    b = np.asarray(ss.run(2500, 500)).reshape(-1, 3)
    np.testing.assert_allclose(a.mean(axis=0), b.mean(axis=0), atol=0.05)
    np.testing.assert_allclose(a.var(axis=0), b.var(axis=0), atol=0.06)


def test_mixing_quality_rhat_ess():
    lik = _gauss_lik([0.0, 1.0], 1.0)
    es = EllipticalSliceSampler(
        lik, init_with_seed(32, 2, seed=6), prior_scale=3.0
    ).seed(8)
    sample = es.run(1000, 200)
    rhat, ess = split_rhat_mean_ess(sample)
    assert float(jnp.max(rhat)) < 1.05
    assert float(jnp.min(ess)) > 1000.0


def test_determinism_same_seed():
    lik = _gauss_lik([0.0, 0.0], 1.0)
    runs = [
        np.asarray(
            EllipticalSliceSampler(lik, init_with_seed(8, 2, seed=7))
            .seed(11)
            .run(64, 8)
        )
        for _ in range(2)
    ]
    np.testing.assert_array_equal(runs[0], runs[1])


def test_block_path_runs_and_matches_moments():
    lik = _gauss_lik([0.0, 0.0], 1.0)
    es = EllipticalSliceSampler(
        lik, init_with_seed(16, 2, seed=8), steps_per_call=4
    ).seed(9)
    sample = np.asarray(es.run(1000, 200))
    assert sample.shape == (16, 1000, 2)
    flat = sample.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 0.0], atol=0.08)
    np.testing.assert_allclose(flat.var(axis=0), [0.5, 0.5], rtol=0.12)


def test_checkpoint_resume_bitexact():
    lik = _gauss_lik([1.0, 0.0], 1.0)
    init = init_with_seed(8, 2, seed=0)
    with tempfile.TemporaryDirectory() as tmp:
        path = tmp + "/ell_ckpt"
        a = EllipticalSliceSampler(lik, init).seed(6)
        a.run(30, 0)
        save_sampler(path, a)
        cont_a = a.run(40, 0)

        b = EllipticalSliceSampler(lik, init).seed(4321)
        restore_sampler(path, b)
        cont_b = b.run(40, 0)
    np.testing.assert_array_equal(np.asarray(cont_a), np.asarray(cont_b))


def test_constructor_validation():
    lik = _gauss_lik([0.0, 0.0], 1.0)
    init = init_with_seed(4, 2, seed=0)
    with pytest.raises(ValueError, match="max_shrink"):
        EllipticalSliceSampler(lik, init, max_shrink=0)
    with pytest.raises(ValueError, match="vector has"):
        EllipticalSliceSampler(
            lik, init, prior_scale=jnp.ones((3,))
        ).run(1, 0)
    with pytest.raises(ValueError, match="Cholesky must be"):
        EllipticalSliceSampler(
            lik, init, prior_scale=jnp.ones((3, 3))
        ).run(1, 0)


def test_run_progress_smoke():
    import io

    lik = _gauss_lik([0.0, 0.0], 1.0)
    es = EllipticalSliceSampler(lik, init_with_seed(8, 2, seed=3)).seed(7)
    stream = io.StringIO()
    sample, stats = es.run_progress(64, 16, stream=stream)
    assert sample.shape == (8, 64, 2)
    assert len(stream.getvalue()) > 0
