"""Metropolis-Hastings end-to-end tests.

Mirrors the reference's MH tests: 2D-Gaussian moment matching with a
negative control (/root/reference/tests/metrohast_2d_gaussian_test.rs:33-92),
discrete Poisson/Binomial frequency-vs-pmf
(/root/reference/tests/metrohast_poisson_test.rs:91-130, :219-249), and the
in-module sampling-moment checks
(/root/reference/src/metropolis_hastings.rs:338-381).
"""

import jax.numpy as jnp
import numpy as np
from scipy.stats import binom, poisson

from mini_mcmc_tpu import MetropolisHastings, init_det
from mini_mcmc_tpu.models import (
    binomial_target,
    gaussian2d,
    isotropic_gaussian_proposal,
    poisson_target,
    random_walk_int_proposal,
)


def _sample_moments(sample):
    flat = np.asarray(sample).reshape(-1, sample.shape[-1])
    return flat.mean(axis=0), np.cov(flat.T)


def test_mh_shapes_and_determinism():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    proposal = isotropic_gaussian_proposal(1.0)
    mh = MetropolisHastings(target, proposal, init_det(4, 2)).seed(42)
    sample = mh.run(100, 10)
    assert sample.shape == (4, 100, 2)
    # same seed, same init => identical trajectories
    mh2 = MetropolisHastings(target, proposal, init_det(4, 2)).seed(42)
    sample2 = mh2.run(100, 10)
    np.testing.assert_array_equal(np.asarray(sample), np.asarray(sample2))
    # different seed differs
    mh3 = MetropolisHastings(target, proposal, init_det(4, 2)).seed(43)
    assert not np.array_equal(np.asarray(sample), np.asarray(mh3.run(100, 10)))


def test_mh_2d_gaussian_moments():
    # Accept-case: sample moments match the target within the reference's
    # tolerances (mean err < 0.5 per coord, cov err < 0.5,
    # metrohast_2d_gaussian_test.rs:47-61).
    mean = np.array([2.0, 3.0])
    cov = np.array([[4.0, 2.0], [2.0, 3.0]])
    target = gaussian2d(mean, cov)
    proposal = isotropic_gaussian_proposal(2.0)
    mh = MetropolisHastings(target, proposal, init_det(8, 2)).seed(7)
    sample = mh.run(4000, 1000)
    m, c = _sample_moments(sample)
    assert np.all(np.abs(m - mean) < 0.5), m
    assert np.max(np.abs(c - cov)) < 0.5, c


def test_mh_2d_gaussian_negative_control():
    # Reject-case: wrong target => covariance mismatch > 1.0
    # (metrohast_2d_gaussian_test.rs:84-91).
    wrong_cov = np.array([[1.0, 0.0], [0.0, 1.0]])
    true_cov = np.array([[6.0, 2.0], [2.0, 5.0]])
    target = gaussian2d([0.0, 0.0], true_cov)
    proposal = isotropic_gaussian_proposal(2.0)
    mh = MetropolisHastings(target, proposal, init_det(8, 2)).seed(11)
    sample = mh.run(4000, 1000)
    _, c = _sample_moments(sample)
    assert np.max(np.abs(c - wrong_cov)) > 1.0


def test_mh_poisson_discrete():
    # Poisson(4), +-1 random walk, frequencies within 0.05 of pmf
    # (metrohast_poisson_test.rs:124-129).
    target = poisson_target(4.0)
    proposal = random_walk_int_proposal()
    init = jnp.zeros((4, 1), jnp.int32)
    mh = MetropolisHastings(target, proposal, init).seed(42)
    sample = mh.run(10000, 2000)
    assert sample.dtype == jnp.int32
    ks = np.asarray(sample).ravel()
    for k in range(11):
        freq = np.mean(ks == k)
        assert abs(freq - poisson.pmf(k, 4.0)) < 0.05, (k, freq)


def test_mh_binomial_discrete():
    # Binomial(10, 0.3) within 0.05 (metrohast_poisson_test.rs:243-248).
    target = binomial_target(10, 0.3)
    proposal = random_walk_int_proposal(clip_low=0, clip_high=10)
    init = jnp.full((4, 1), 5, jnp.int32)
    mh = MetropolisHastings(target, proposal, init).seed(4)
    sample = mh.run(10000, 2000)
    ks = np.asarray(sample).ravel()
    for k in range(11):
        freq = np.mean(ks == k)
        assert abs(freq - binom.pmf(k, 10, 0.3)) < 0.05, (k, freq)


def test_mh_chains_continue_across_runs():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    proposal = isotropic_gaussian_proposal(1.0)
    mh = MetropolisHastings(target, proposal, init_det(2, 2)).seed(0)
    s1 = mh.run(10, 0)
    start_of_second = mh.positions
    # second run continues from the first run's final state
    np.testing.assert_array_equal(
        np.asarray(s1[:, -1, :]), np.asarray(start_of_second)
    )


def test_mh_run_progress_returns_stats():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    proposal = isotropic_gaussian_proposal(1.0)
    mh = MetropolisHastings(target, proposal, init_det(4, 2)).seed(1)
    sample, stats = mh.run_progress(500, 100)
    assert sample.shape == (4, 500, 2)
    assert stats.ess.min > 0


def test_mh_per_chain_proposal_fallback():
    # A user proposal WITHOUT sample_batch takes the vmapped per-chain-key
    # path; it must sample correctly (built-in proposals all provide
    # sample_batch, so this branch needs its own coverage).
    from mini_mcmc_tpu.models.base import Proposal

    def sample(key, current):
        return current + jnp.asarray(
            0.8, current.dtype
        ) * __import__("jax").random.normal(key, current.shape, current.dtype)

    def logp(frm, to):
        diff = to - frm
        return -jnp.sum(diff * diff) / (2.0 * 0.8**2)

    prop = Proposal(sample=sample, logp=logp)
    assert prop.sample_batch is None
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    mh = MetropolisHastings(target, prop, init_det(8, 2)).seed(3)
    flat = np.asarray(mh.run(3000, 500)).reshape(-1, 2)
    assert np.all(np.abs(flat.mean(axis=0)) < 0.2), flat.mean(axis=0)
    assert np.max(np.abs(np.cov(flat.T) - np.eye(2))) < 0.3


# -- adaptive proposal-scale tuning (beyond-reference) ----------------------


def _move_rate(sample):
    """Fraction of steps that changed the state (empirical acceptance)."""
    s = np.asarray(sample)
    return float(np.mean(np.any(s[:, 1:] != s[:, :-1], axis=-1)))


def test_mh_tuned_shrinks_oversized_proposal():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    mh = MetropolisHastings(
        target, isotropic_gaussian_proposal(25.0), init_det(256, 2)
    ).seed(7)
    tuned = mh.tuned(400)
    # a 25-sigma step on a unit Gaussian must shrink a lot
    assert tuned.scale_factor < 0.2, tuned.scale_factor
    rate = _move_rate(tuned.run(400, 50))
    assert 0.15 <= rate <= 0.32, rate  # dual-averaged to ~0.234


def test_mh_tuned_grows_undersized_proposal():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    mh = MetropolisHastings(
        target, isotropic_gaussian_proposal(0.01), init_det(256, 2)
    ).seed(7)
    tuned = mh.tuned(400)
    assert tuned.scale_factor > 10.0, tuned.scale_factor
    rate = _move_rate(tuned.run(400, 50))
    assert 0.15 <= rate <= 0.32, rate


def test_mh_tuned_seeded_is_deterministic():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])

    def factor():
        mh = MetropolisHastings(
            target, isotropic_gaussian_proposal(5.0), init_det(64, 2)
        ).seed(11)
        return mh.tuned(200).scale_factor

    assert factor() == factor()


def test_mh_tuned_requires_scaled_family():
    import pytest

    from mini_mcmc_tpu.models.base import Proposal

    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    prop = isotropic_gaussian_proposal(1.0)
    unscalable = Proposal(sample=prop.sample, logp=prop.logp,
                          sample_batch=prop.sample_batch)
    mh = MetropolisHastings(target, unscalable, init_det(8, 2)).seed(0)
    with pytest.raises(ValueError, match="scaled"):
        mh.tuned(10)


def test_mh_tuned_cumulative_scale_factor():
    # tuned() twice: the second factor should be ~1 (already tuned) and
    # scale_factor tracks the cumulative product vs the ORIGINAL proposal
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    mh = MetropolisHastings(
        target, isotropic_gaussian_proposal(25.0), init_det(256, 2)
    ).seed(3)
    once = mh.tuned(400)
    twice = once.tuned(400)
    second_leg = twice.scale_factor / once.scale_factor
    assert 0.5 <= second_leg <= 2.0, (once.scale_factor, twice.scale_factor)
    rate = _move_rate(twice.run(400, 50))
    assert 0.15 <= rate <= 0.32, rate


def test_mh_tuned_improves_ess_from_bad_scale():
    from mini_mcmc_tpu import split_rhat_mean_ess

    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    bad = MetropolisHastings(
        target, isotropic_gaussian_proposal(25.0), init_det(64, 2)
    ).seed(5)
    tuned = bad.tuned(400)
    _, ess_bad = split_rhat_mean_ess(bad.run(500, 100))
    _, ess_tuned = split_rhat_mean_ess(tuned.run(500, 100))
    assert float(jnp.mean(ess_tuned)) > 2.0 * float(jnp.mean(ess_bad)), (
        ess_bad, ess_tuned)
