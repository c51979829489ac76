"""Stochastic-gradient MCMC tests (SGLD / pSGLD / SGHMC, ops/sgmcmc.py).

Beyond-reference capability (the Rust reference's gradient samplers all use
exact gradients, /root/reference/src/hmc.rs:36-432), tested with the same
tiers as the other samplers: estimator correctness (the minibatch gradient
is UNBIASED — the property the whole family rests on), sampling moments
against analytic stationary distributions (including the conjugate
Gaussian posterior, where the exact answer is closed-form), the shared
reproducibility/continuation/checkpoint contracts, and constructor
validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_mcmc_tpu import (
    SGHMC,
    SGLD,
    init_det,
    minibatch_grad,
    polynomial_decay,
    target_grad,
)
from mini_mcmc_tpu.models import diffable_gaussian2d, standard_normal


def _conjugate_problem(seed=0, n=512, dim=2, sigma0=1.0):
    """y_i ~ N(x, I) with prior x ~ N(0, sigma0^2 I): exact Gaussian
    posterior N(n*ybar/(n + 1/sigma0^2), I/(n + 1/sigma0^2))."""
    rng = np.random.default_rng(seed)
    x_true = rng.normal(size=(dim,))
    y = x_true + rng.normal(size=(n, dim))
    data = jnp.asarray(y)
    prec = n + 1.0 / sigma0**2
    post_mean = data.sum(axis=0) / prec
    post_var = 1.0 / prec

    def log_prior(x):
        return -0.5 * jnp.sum(x**2) / sigma0**2

    def log_like(x, batch):
        return -0.5 * jnp.sum((batch - x) ** 2)

    return log_prior, log_like, data, np.asarray(post_mean), float(post_var)


# -- estimator ---------------------------------------------------------------


def test_minibatch_grad_is_unbiased():
    log_prior, log_like, data, _, _ = _conjugate_problem()
    n = data.shape[0]
    grad_fn = minibatch_grad(log_prior, log_like, data, batch_size=32)
    x = jnp.asarray([[0.3, -0.7], [1.0, 0.0]])
    # Exact full gradient: -x + sum_i (y_i - x).
    exact = -x + (jnp.sum(data, axis=0)[None, :] - n * x)
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    est = jnp.mean(jax.vmap(lambda k: grad_fn(x, k))(keys), axis=0)
    # MC error of the mean: the estimator's std is O(n/sqrt(B)) per
    # coordinate here; 4000 keys shrink it ~63x.
    np.testing.assert_allclose(np.asarray(est), np.asarray(exact),
                               atol=3.0, rtol=0.02)


def test_minibatch_grad_per_chain_batches_unbiased():
    log_prior, log_like, data, _, _ = _conjugate_problem()
    n = data.shape[0]
    grad_fn = minibatch_grad(log_prior, log_like, data, batch_size=32,
                             shared_batch=False)
    x = jnp.asarray([[0.3, -0.7], [1.0, 0.0]])
    exact = -x + (jnp.sum(data, axis=0)[None, :] - n * x)
    keys = jax.random.split(jax.random.PRNGKey(1), 4000)
    est = jnp.mean(jax.vmap(lambda k: grad_fn(x, k))(keys), axis=0)
    np.testing.assert_allclose(np.asarray(est), np.asarray(exact),
                               atol=3.0, rtol=0.02)


def test_minibatch_grad_pytree_data():
    # data as an (X, y) tuple with a matmul likelihood — the MXU shape.
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.normal(size=(128, 3)))
    y = jnp.asarray(rng.normal(size=(128,)))

    def log_like(w, batch):
        bx, by = batch
        return -0.5 * jnp.sum((by - bx @ w) ** 2)

    grad_fn = minibatch_grad(lambda w: -0.5 * jnp.sum(w**2), log_like,
                             (X, y), batch_size=16)
    g = grad_fn(jnp.zeros((4, 3)), jax.random.PRNGKey(0))
    assert g.shape == (4, 3)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_target_grad_matches_target():
    target = diffable_gaussian2d([0.0, 1.0], [[2.0, 0.5], [0.5, 1.0]])
    grad_fn = target_grad(target)
    x = jnp.asarray([[0.2, -0.4], [1.5, 2.0]])
    _, exact = target.batch_logp_and_grad(x)
    np.testing.assert_allclose(
        np.asarray(grad_fn(x, jax.random.PRNGKey(0))), np.asarray(exact)
    )


def test_minibatch_grad_validation():
    data = jnp.zeros((8, 2))
    with pytest.raises(ValueError, match="batch_size"):
        minibatch_grad(lambda x: 0.0, lambda x, b: 0.0, data, batch_size=9)
    with pytest.raises(ValueError, match="leading axis"):
        minibatch_grad(lambda x: 0.0, lambda x, b: 0.0,
                       (jnp.zeros((8, 2)), jnp.zeros((7,))), batch_size=4)


# -- SGLD --------------------------------------------------------------------


def test_sgld_shapes_and_reproducibility():
    grad_fn = target_grad(standard_normal())
    a = SGLD(grad_fn, init_det(4, 3), step_size=0.01, seed=5).run(50, 10)
    b = SGLD(grad_fn, init_det(4, 3), step_size=0.01, seed=5).run(50, 10)
    assert a.shape == (4, 50, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sgld_full_batch_gaussian_moments():
    # Unadjusted Langevin on N(0, I): stationary variance 1/(1 - eps/4)
    # per coordinate — with eps = 0.05 that is 1.0127, well inside band.
    grad_fn = target_grad(standard_normal())
    sgld = SGLD(grad_fn, init_det(32, 2), step_size=0.05, seed=42)
    flat = np.asarray(sgld.run(4000, 500)).reshape(-1, 2)
    assert np.all(np.abs(flat.mean(axis=0)) < 0.08), flat.mean(axis=0)
    assert np.all(np.abs(flat.var(axis=0) - 1.0) < 0.12), flat.var(axis=0)


def test_sgld_minibatch_conjugate_posterior():
    log_prior, log_like, data, post_mean, post_var = _conjugate_problem()
    grad_fn = minibatch_grad(log_prior, log_like, data, batch_size=64)
    # Stability needs eps < 2/curvature = 2/513; stay well under it.
    sgld = SGLD(grad_fn, jnp.tile(jnp.asarray(post_mean)[None], (8, 1)),
                step_size=5e-4, seed=7)
    flat = np.asarray(sgld.run(3000, 1000)).reshape(-1, 2)
    post_std = np.sqrt(post_var)
    assert np.all(np.abs(flat.mean(axis=0) - post_mean) < 3 * post_std), (
        flat.mean(axis=0), post_mean)
    # Minibatch noise inflates the stationary variance by
    # ~ eps * Var[grad noise] / (2 * curvature); keep a generous band.
    assert np.all(flat.var(axis=0) < 4.0 * post_var), (flat.var(axis=0),
                                                       post_var)
    assert np.all(flat.var(axis=0) > 0.5 * post_var)


def test_psgld_equalizes_anisotropic_scales():
    # N(0, diag(1, 100)): one shared step size samples both coordinates
    # because RMSProp preconditioning rescales each by ~sigma. rms_decay
    # is 0.999 here (not the 0.99 default): pSGLD drops the Li et al.
    # Gamma correction term, whose bias scales with how strongly the
    # EWMA V tracks the CURRENT state's g^2 — a longer memory decorrelates
    # V from x and the measured variance bias falls from ~45% to ~12%.
    sigma2 = jnp.asarray([1.0, 100.0])

    def grad_fn(x, key):
        del key
        return -x / sigma2[None, :]

    sgld = SGLD(grad_fn, init_det(16, 2), step_size=0.02, seed=9,
                preconditioner="rmsprop", rms_decay=0.999)
    flat = np.asarray(sgld.run(6000, 2000)).reshape(-1, 2)
    var = flat.var(axis=0)
    assert abs(var[0] - 1.0) < 0.3, var
    assert abs(var[1] - 100.0) < 30.0, var
    # the equalization claim itself: the sampled scale ratio tracks the
    # target's 100x anisotropy
    assert 70.0 < var[1] / var[0] < 140.0, var

    # negative control: plain SGLD at the SAME shared step size is still
    # far from the sigma=10 coordinate's scale in this budget (its
    # effective step there is 100x smaller), while pSGLD above has
    # already equilibrated — preconditioning, not budget, closes the gap.
    plain = SGLD(grad_fn, init_det(16, 2), step_size=0.02, seed=9)
    flat_p = np.asarray(plain.run(6000, 2000)).reshape(-1, 2)
    var_p = flat_p.var(axis=0)
    assert var_p[1] < 65.0, var_p


def test_sgld_schedule_decays_on_device():
    grad_fn = target_grad(standard_normal())
    sched = polynomial_decay(0.05, 10.0, 0.55)
    assert float(sched(jnp.int32(0))) > float(sched(jnp.int32(1000)))
    sgld = SGLD(grad_fn, init_det(4, 2), step_size=sched, seed=3)
    sgld.run(20, 5)
    # The step counter is part of the state (drives the schedule and
    # survives checkpoints): 25 steps taken.
    assert int(sgld.state.step) == 25


def test_sgld_temperature_zero_is_gradient_ascent():
    # T=0 removes the noise: from anywhere, chains contract to the mode.
    grad_fn = target_grad(standard_normal())
    sgld = SGLD(grad_fn, 5.0 * jnp.ones((4, 2)), step_size=0.1, seed=0,
                temperature=0.0)
    sgld.run(200, 0)
    assert np.all(np.abs(np.asarray(sgld.positions)) < 1e-3)


def test_sgld_steps_per_call_block_kernel():
    grad_fn = target_grad(standard_normal())
    s = SGLD(grad_fn, init_det(4, 2), step_size=0.05, seed=11,
             steps_per_call=8)
    a = s.run(48, 16)
    assert a.shape == (4, 48, 2)
    b = SGLD(grad_fn, init_det(4, 2), step_size=0.05, seed=11,
             steps_per_call=8).run(48, 16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="multiples"):
        s.run(10, 0)


def test_sgld_validation():
    grad_fn = target_grad(standard_normal())
    with pytest.raises(ValueError, match="preconditioner"):
        SGLD(grad_fn, init_det(2, 2), step_size=0.01, preconditioner="adam")
    with pytest.raises(ValueError, match="step_size"):
        SGLD(grad_fn, init_det(2, 2), step_size=-1.0)
    with pytest.raises(ValueError, match="temperature"):
        SGLD(grad_fn, init_det(2, 2), step_size=0.01, temperature=-0.5)


# -- SGHMC -------------------------------------------------------------------


def test_sghmc_shapes_and_reproducibility():
    grad_fn = target_grad(standard_normal())
    a = SGHMC(grad_fn, init_det(4, 3), step_size=0.05, seed=5).run(50, 50)
    b = SGHMC(grad_fn, init_det(4, 3), step_size=0.05, seed=5).run(50, 50)
    assert a.shape == (4, 50, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sghmc_full_batch_gaussian_moments():
    grad_fn = target_grad(standard_normal())
    s = SGHMC(grad_fn, init_det(32, 2), step_size=0.02, friction=0.1,
              seed=21)
    flat = np.asarray(s.run(6000, 1000)).reshape(-1, 2)
    assert np.all(np.abs(flat.mean(axis=0)) < 0.1), flat.mean(axis=0)
    assert np.all(np.abs(flat.var(axis=0) - 1.0) < 0.15), flat.var(axis=0)


def test_sghmc_minibatch_conjugate_posterior():
    log_prior, log_like, data, post_mean, post_var = _conjugate_problem()
    grad_fn = minibatch_grad(log_prior, log_like, data, batch_size=64)
    s = SGHMC(grad_fn, jnp.tile(jnp.asarray(post_mean)[None], (8, 1)),
              step_size=2e-4, friction=0.3, seed=13)
    flat = np.asarray(s.run(3000, 1000)).reshape(-1, 2)
    post_std = np.sqrt(post_var)
    assert np.all(np.abs(flat.mean(axis=0) - post_mean) < 3 * post_std), (
        flat.mean(axis=0), post_mean)


def test_sghmc_validation():
    grad_fn = target_grad(standard_normal())
    with pytest.raises(ValueError, match="friction"):
        SGHMC(grad_fn, init_det(2, 2), step_size=0.01, friction=0.0)
    with pytest.raises(ValueError, match="friction"):
        SGHMC(grad_fn, init_det(2, 2), step_size=0.01, friction=1.5)


# -- shared contracts --------------------------------------------------------


def test_sgld_run_continuation():
    # Two consecutive runs continue the chain: the second run starts from
    # the first's final positions (and the step counter keeps counting).
    grad_fn = target_grad(standard_normal())
    s = SGLD(grad_fn, init_det(4, 2), step_size=0.05, seed=17)
    s.run(10, 0)
    first_end = np.asarray(s.positions).copy()
    sample2 = s.run(10, 0)
    assert int(s.state.step) == 20
    # run 2 continued from run 1's end rather than restarting
    assert not np.allclose(np.asarray(sample2[:, -1]), first_end)


def test_sgld_checkpoint_roundtrip(tmp_path):
    from mini_mcmc_tpu.checkpoint import restore_sampler, save_sampler

    grad_fn = target_grad(standard_normal())
    s = SGLD(grad_fn, init_det(4, 2), step_size=0.05, seed=23)
    s.run(16, 0)
    path = str(tmp_path / "sgld_ckpt")
    save_sampler(path, s)
    cont = s.run(16, 0)

    s2 = SGLD(grad_fn, init_det(4, 2), step_size=0.05, seed=0)
    restore_sampler(path, s2)
    resumed = s2.run(16, 0)
    np.testing.assert_array_equal(np.asarray(cont), np.asarray(resumed))
    assert int(s2.state.step) == 32


def test_sgld_run_progress_reports_full_acceptance():
    # run_progress works unchanged for the accept-free family; the
    # tracker's "state changed" EWMA reads ~1.0 by construction (SGLD
    # always moves), so live bars stay meaningful.
    import io
    import re

    grad_fn = target_grad(standard_normal())
    s = SGLD(grad_fn, init_det(4, 2), step_size=0.05, seed=7)
    out = io.StringIO()
    sample, stats = s.run_progress(64, 16, stream=out)
    assert sample.shape == (4, 64, 2)
    assert np.isfinite(stats.ess.mean) and stats.ess.mean > 0
    rates = [float(v) for v in
             re.findall(r"p\(accept\)≈(\d+\.\d+)", out.getvalue())]
    # the global EWMA warms up from 0 (ALPHA=0.01), so early ticks read
    # low; by the final render every bar sits near 1.0
    assert len(rates) >= 5 and min(rates[-5:]) > 0.9, rates
