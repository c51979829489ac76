"""Annealed importance sampling tests (beyond-reference capability).

AIS is exactly checkable: for a Gaussian target written UNNORMALIZED, the
true normalizing constant is analytic, so the log-Z estimate is pinned to
ground truth (no reference analog — the Rust crate stops at sampling).
The estimator's defining invariance — E[w] = Z for ANY schedule — shows up
as agreement across rung counts, and the weight-ESS diagnostic must
collapse when the schedule is made absurdly coarse on a hard target.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mini_mcmc_tpu import ais_log_z, linear_betas
from mini_mcmc_tpu.models.base import Target


def _unnorm_gaussian(mean, std):
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def batch_logp(xs):
        return -0.5 * jnp.sum(((xs - mean) / std) ** 2, axis=-1)

    return Target(logp=lambda x: batch_logp(x[None])[0],
                  logp_batch=batch_logp)


def test_log_z_pinned_to_analytic_gaussian():
    # unnormalized N(mu, diag(std^2)): true log Z = sum log(sqrt(2 pi) std)
    mean, std = jnp.asarray([1.0, -2.0]), jnp.asarray([1.5, 0.5])
    true_log_z = float(jnp.sum(jnp.log(jnp.sqrt(2 * jnp.pi) * std)))
    r = ais_log_z(_unnorm_gaussian(mean, std), 4096, 2,
                  betas=128, n_mh_steps=2, proposal_std=0.8, seed=0)
    assert float(r.weight_ess) > 0.5, r.weight_ess
    assert abs(float(r.log_z) - true_log_z) < 0.05, (
        float(r.log_z), true_log_z)
    # final particles approximate the target
    pos = np.asarray(r.positions)
    assert np.abs(pos.mean(axis=0) - np.asarray(mean)).max() < 0.15
    assert r.log_weights.shape == (4096,)


def test_schedule_invariance_of_the_mean():
    # E[w] = Z holds for ANY rung count; coarse and fine schedules must
    # agree within Monte Carlo error (the variance differs, the mean not)
    t = _unnorm_gaussian([0.0], [2.0])
    true_log_z = float(np.log(np.sqrt(2 * np.pi) * 2.0))
    coarse = ais_log_z(t, 8192, 1, betas=8, n_mh_steps=2,
                       proposal_std=1.0, seed=3)
    fine = ais_log_z(t, 8192, 1, betas=128, n_mh_steps=2,
                     proposal_std=1.0, seed=4)
    assert abs(float(coarse.log_z) - true_log_z) < 0.1
    assert abs(float(fine.log_z) - true_log_z) < 0.05
    assert float(fine.weight_ess) > float(coarse.weight_ess)


def test_scaled_target_shifts_log_z_exactly():
    # multiplying the density by exp(c) must shift log Z by exactly c —
    # same seed, so the two runs share every proposal and accept draw
    base = _unnorm_gaussian([0.5], [1.0])
    shifted = Target(
        logp=lambda x: base.logp(x) + 3.0,
        logp_batch=lambda xs: base.batch_logp(xs) + 3.0,
    )
    a = ais_log_z(base, 2048, 1, betas=32, seed=7)
    b = ais_log_z(shifted, 2048, 1, betas=32, seed=7)
    # the anneal dynamics differ (beta * c enters the accept ratio), so
    # only the estimates' difference is pinned — loosely, both being
    # near-exact estimators of log Z and log Z + 3
    assert abs((float(b.log_z) - float(a.log_z)) - 3.0) < 0.1


def test_weight_ess_collapses_on_coarse_schedule():
    # a far-away narrow target with a 1-rung schedule is plain importance
    # sampling from the prior: the ESS diagnostic must flag it
    t = _unnorm_gaussian([6.0], [0.1])
    r = ais_log_z(t, 2048, 1, betas=1, n_mh_steps=0, seed=1)
    assert float(r.weight_ess) < 0.05, float(r.weight_ess)


def test_determinism_and_validation():
    t = _unnorm_gaussian([0.0], [1.0])
    a = ais_log_z(t, 256, 1, betas=16, seed=5)
    b = ais_log_z(t, 256, 1, betas=16, seed=5)
    np.testing.assert_array_equal(np.asarray(a.log_weights),
                                  np.asarray(b.log_weights))
    assert linear_betas(4) == (0.25, 0.5, 0.75, 1.0)
    with pytest.raises(ValueError, match="end at 1.0"):
        ais_log_z(t, 256, 1, betas=(0.5, 0.9))
    with pytest.raises(ValueError, match="increasing"):
        ais_log_z(t, 256, 1, betas=(0.7, 0.3, 1.0))
    with pytest.raises(ValueError, match="n_particles"):
        ais_log_z(t, 1, 1)
    with pytest.raises(ValueError, match="seed or key"):
        import jax

        ais_log_z(t, 256, 1, seed=1, key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="prior_std"):
        ais_log_z(t, 256, 1, prior_std=0.0)


def test_resample_matches_weighted_moments():
    # systematic resampling turns the weighted population into unweighted
    # draws whose moments match the self-normalized importance estimate
    import jax

    from mini_mcmc_tpu.ops.ais import resample

    t = _unnorm_gaussian([2.0], [0.7])
    r = ais_log_z(t, 8192, 1, betas=32, n_mh_steps=2, seed=2)
    w = np.exp(np.asarray(r.log_weights)
               - np.max(np.asarray(r.log_weights)))
    w = w / w.sum()
    weighted_mean = float(w @ np.asarray(r.positions)[:, 0])
    draws = resample(r.log_weights, r.positions, jax.random.PRNGKey(0))
    assert draws.shape == (8192, 1)
    assert abs(float(np.mean(np.asarray(draws))) - weighted_mean) < 0.03
    assert abs(weighted_mean - 2.0) < 0.1
    # stratified: a dominant weight is replicated ~N*W_i times, +-1
    log_w = np.full(64, -np.inf, np.float32)
    log_w[[3, 40]] = np.log(0.75), np.log(0.25)
    pos = np.arange(64, dtype=np.float32)[:, None]
    d = np.asarray(resample(log_w, pos, jax.random.PRNGKey(1)))
    assert abs(np.sum(d == 3.0) - 48) <= 1 and abs(np.sum(d == 40.0) - 16) <= 1
    # n_draws override + validation
    assert resample(log_w, pos, jax.random.PRNGKey(2), n_draws=7).shape == (7, 1)
    with pytest.raises(ValueError, match="n_draws"):
        resample(log_w, pos, jax.random.PRNGKey(3), n_draws=0)
