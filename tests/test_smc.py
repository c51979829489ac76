"""Adaptive SMC sampler tests (beyond-reference capability).

Same exactness lever as the AIS tests: unnormalized Gaussian targets have
analytic normalizers, so log-Z estimates pin to ground truth. The
adaptive-specific claims: the ESS bisection actually holds each stage at
the target fraction, harder anneals automatically get more stages, and a
truncated anneal (max_stages too small) raises instead of returning a
biased estimate.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mini_mcmc_tpu import smc_log_z
from mini_mcmc_tpu.models.base import Target


def _unnorm_gaussian(mean, std):
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def batch_logp(xs):
        return -0.5 * jnp.sum(((xs - mean) / std) ** 2, axis=-1)

    return Target(logp=lambda x: batch_logp(x[None])[0],
                  logp_batch=batch_logp)


def test_log_z_pinned_to_analytic_gaussian():
    mean, std = jnp.asarray([1.0, -2.0]), jnp.asarray([1.5, 0.5])
    true_log_z = float(jnp.sum(jnp.log(jnp.sqrt(2 * jnp.pi) * std)))
    r = smc_log_z(_unnorm_gaussian(mean, std), 8192, 2,
                  n_mh_steps=3, proposal_std=0.8, seed=0)
    assert abs(float(r.log_z) - true_log_z) < 0.05, (
        float(r.log_z), true_log_z)
    pos = np.asarray(r.positions)
    assert np.abs(pos.mean(axis=0) - np.asarray(mean)).max() < 0.15
    assert np.abs(pos.std(axis=0) - np.asarray(std)).max() < 0.15


def test_adaptive_schedule_properties():
    # each non-final increment pins the incremental ESS at target_ess
    # (bisection resolution), the schedule is increasing and ends at 1,
    # and a harder anneal (shifted, narrower target) takes more stages
    easy = smc_log_z(_unnorm_gaussian([0.0], [1.0]), 4096, 1,
                     target_ess=0.5, seed=1)
    hard = smc_log_z(_unnorm_gaussian([4.0], [0.5]), 4096, 1,
                     target_ess=0.5, n_mh_steps=8, seed=1)
    for r in (easy, hard):
        b = np.asarray(r.betas)
        assert b.shape == (r.n_stages,)
        assert np.all(np.diff(np.concatenate([[0.0], b])) > 0)
        assert b[-1] == 1.0
        ess = np.asarray(r.stage_ess)
        # all but the final jump sit at the target (bisection pins them)
        if r.n_stages > 1:
            np.testing.assert_allclose(ess[:-1], 0.5, atol=0.02)
        assert np.all(ess >= 0.45)
    assert hard.n_stages > easy.n_stages
    # the hard target's log Z is still pinned (the point of SMC: no
    # hand-tuned schedule, same exactness). Tolerance covers the log-space
    # skew of the product estimator at this ESS target (see smc.py notes).
    true_hard = float(np.log(np.sqrt(2 * np.pi) * 0.5))
    assert abs(float(hard.log_z) - true_hard) < 0.15


def test_agrees_with_ais_on_shared_target():
    from mini_mcmc_tpu import ais_log_z

    t = _unnorm_gaussian([2.0, 0.0], [1.0, 2.0])
    true_log_z = float(np.sum(np.log(np.sqrt(2 * np.pi)
                                     * np.asarray([1.0, 2.0]))))
    a = ais_log_z(t, 8192, 2, betas=64, n_mh_steps=2, seed=3)
    s = smc_log_z(t, 8192, 2, n_mh_steps=2, seed=3)
    assert abs(float(a.log_z) - true_log_z) < 0.1
    assert abs(float(s.log_z) - true_log_z) < 0.1
    assert abs(float(a.log_z) - float(s.log_z)) < 0.15


def test_truncated_anneal_raises():
    # max_stages too small for the target: a truncated anneal would
    # silently under-integrate log Z — must raise, not return
    with pytest.raises(RuntimeError, match="max_stages"):
        smc_log_z(_unnorm_gaussian([7.0], [0.1]), 1024, 1,
                  target_ess=0.9, max_stages=3, seed=2)


def test_determinism_and_validation():
    t = _unnorm_gaussian([0.0], [1.0])
    a = smc_log_z(t, 512, 1, seed=5)
    b = smc_log_z(t, 512, 1, seed=5)
    assert float(a.log_z) == float(b.log_z)
    np.testing.assert_array_equal(np.asarray(a.positions),
                                  np.asarray(b.positions))
    with pytest.raises(ValueError, match="target_ess"):
        smc_log_z(t, 512, 1, target_ess=1.0)
    with pytest.raises(ValueError, match="n_particles"):
        smc_log_z(t, 1, 1)
    with pytest.raises(ValueError, match="seed or key"):
        import jax

        smc_log_z(t, 512, 1, seed=1, key=jax.random.PRNGKey(0))
