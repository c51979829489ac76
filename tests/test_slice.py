"""Coordinate-wise slice sampler tests (beyond-reference capability).

The strongest check is exact stationarity: starting a large chain batch
from an EXACT sample of the target, one sweep must leave the marginal
distribution unchanged (KS test) — this exercises the capped stepping-out
reversibility and the shrinkage accept rule together. Plus moment matching
on a correlated Gaussian (no tuning), a hard-support target (exponential,
``-inf`` outside), width robustness at both extremes, determinism, the
K-sweep block path, and checkpoint continuation.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

from mini_mcmc_tpu import SliceSampler, init_with_seed, split_rhat_mean_ess
from mini_mcmc_tpu.checkpoint import restore_sampler, save_sampler
from mini_mcmc_tpu.models import gaussian2d
from mini_mcmc_tpu.models.base import Target


def _std_normal():
    return Target(logp=lambda x: -0.5 * jnp.sum(x * x))


def test_shape_contract_and_runner():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    ss = SliceSampler(target, init_with_seed(4, 2, seed=0)).seed(1)
    sample = ss.run(50, 10)
    assert sample.shape == (4, 50, 2)
    assert ss.positions.shape == (4, 2)


def test_stationarity_one_sweep_ks():
    # Start 4096 chains at an exact N(0, 1) sample; after one full sweep
    # the marginal must still be N(0, 1). This is the sharpest correctness
    # test for the bracket construction: a reversibility bug in the capped
    # stepping-out or an off-by-one in shrinkage shifts the distribution.
    n = 4096
    exact = jax.random.normal(jax.random.PRNGKey(7), (n, 2))
    # small width + tight stepout cap forces the capped code path
    ss = SliceSampler(_std_normal(), exact, width=0.5, max_stepouts=4)
    ss.seed(3)
    out = np.asarray(ss.run(1, 0))[:, 0, :]
    for d in range(2):
        ks = sps.kstest(out[:, d], "norm")
        assert ks.pvalue > 0.01, (d, ks)


def test_moments_correlated_gaussian_no_tuning():
    # The reference band-target family ([0,1], [[4,2],[2,3]],
    # /root/reference/src/hmc.rs:632-700): slice sampling needs no scale
    # tuning — width=1 on a sd-2 target just steps out.
    target = gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    ss = SliceSampler(target, init_with_seed(64, 2, seed=1)).seed(2)
    sample = np.asarray(ss.run(1500, 300))
    flat = sample.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 1.0], atol=0.12)
    cov = np.cov(flat.T)
    np.testing.assert_allclose(
        cov, [[4.0, 2.0], [2.0, 3.0]], rtol=0.12, atol=0.12
    )
    rhat, ess = split_rhat_mean_ess(jnp.asarray(sample))
    assert float(jnp.max(rhat)) < 1.05
    assert float(jnp.min(ess)) > 1000.0


def test_hard_support_exponential():
    # Exponential(1): logp = -x for x > 0, -inf outside. The strict slice
    # test must keep every draw inside the support and match mean=var=1.
    target = Target(
        logp=lambda x: jnp.where(
            jnp.all(x > 0.0), -jnp.sum(x), -jnp.inf
        )
    )
    init = jnp.abs(init_with_seed(32, 1, seed=2)) + 0.1
    ss = SliceSampler(target, init, width=1.0).seed(4)
    sample = np.asarray(ss.run(2000, 200))
    assert np.all(sample > 0.0)
    flat = sample.reshape(-1)
    np.testing.assert_allclose(flat.mean(), 1.0, atol=0.08)
    np.testing.assert_allclose(flat.var(), 1.0, atol=0.15)


def test_width_robustness_extremes():
    # Exactness does not depend on the width: a 50x-too-large width (pure
    # shrinkage) and a 10x-too-small width (pure stepping out) both match
    # the target's moments.
    for width in (0.1, 50.0):
        ss = SliceSampler(
            _std_normal(), init_with_seed(32, 1, seed=3), width=width
        ).seed(5)
        flat = np.asarray(ss.run(1500, 150)).reshape(-1)
        np.testing.assert_allclose(flat.mean(), 0.0, atol=0.08,
                                   err_msg=f"width={width}")
        np.testing.assert_allclose(flat.var(), 1.0, atol=0.12,
                                   err_msg=f"width={width}")


def test_per_coordinate_width():
    # [D] width arrays scale each coordinate's bracket independently;
    # moments on an anisotropic diagonal Gaussian.
    target = gaussian2d([0.0, 0.0], [[0.01, 0.0], [0.0, 100.0]])
    ss = SliceSampler(
        target, 0.1 * init_with_seed(32, 2, seed=4),
        width=jnp.array([0.1, 10.0]),
    ).seed(6)
    flat = np.asarray(ss.run(1500, 150)).reshape(-1, 2)
    np.testing.assert_allclose(flat.var(axis=0), [0.01, 100.0], rtol=0.15)


def test_determinism_same_seed():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    runs = [
        np.asarray(
            SliceSampler(target, init_with_seed(8, 2, seed=5))
            .seed(11)
            .run(64, 8)
        )
        for _ in range(2)
    ]
    np.testing.assert_array_equal(runs[0], runs[1])


def test_block_path_runs_and_matches_moments():
    ss = SliceSampler(
        _std_normal(), init_with_seed(16, 2, seed=6), steps_per_call=4
    ).seed(7)
    sample = np.asarray(ss.run(1000, 200))
    assert sample.shape == (16, 1000, 2)
    flat = sample.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(flat.var(axis=0), [1.0, 1.0], atol=0.12)


def test_checkpoint_resume_bitexact():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.5], [0.5, 2.0]])
    init = init_with_seed(8, 2, seed=0)
    with tempfile.TemporaryDirectory() as tmp:
        path = tmp + "/slice_ckpt"
        a = SliceSampler(target, init).seed(6)
        a.run(30, 0)
        save_sampler(path, a)
        cont_a = a.run(40, 0)

        b = SliceSampler(target, init).seed(4321)
        restore_sampler(path, b)
        cont_b = b.run(40, 0)
    np.testing.assert_array_equal(np.asarray(cont_a), np.asarray(cont_b))


def test_constructor_validation():
    target = _std_normal()
    init = init_with_seed(4, 2, seed=0)
    with pytest.raises(ValueError, match="max_stepouts"):
        SliceSampler(target, init, max_stepouts=0)
    with pytest.raises(ValueError, match="max_shrink"):
        SliceSampler(target, init, max_shrink=0)
    with pytest.raises(ValueError, match="positive"):
        SliceSampler(target, init, width=0.0)
    with pytest.raises(ValueError, match="scalar or"):
        SliceSampler(target, init, width=jnp.ones((2, 2)))


def test_run_progress_smoke():
    import io

    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    ss = SliceSampler(target, init_with_seed(8, 2, seed=3)).seed(7)
    stream = io.StringIO()
    sample, stats = ss.run_progress(64, 16, stream=stream)
    assert sample.shape == (8, 64, 2)
    assert len(stream.getvalue()) > 0


def test_width_auto_from_ensemble():
    # width="auto" takes per-coordinate cross-chain stds of the initial
    # ensemble; degenerate coordinates fall back to 1. Moments must match
    # on an anisotropic target when the ensemble is spread accordingly.
    target = gaussian2d([0.0, 0.0], [[0.04, 0.0], [0.0, 25.0]])
    init = init_with_seed(64, 2, seed=8) * jnp.array([0.2, 5.0])
    ss = SliceSampler(target, init, width="auto").seed(9)
    w = np.asarray(ss.width)
    assert 0.1 < w[0] < 0.4 and 2.5 < w[1] < 8.0, w
    flat = np.asarray(ss.run(1200, 150)).reshape(-1, 2)
    np.testing.assert_allclose(flat.var(axis=0), [0.04, 25.0], rtol=0.15)

    # degenerate ensemble (all chains identical): falls back to width 1
    ss2 = SliceSampler(target, jnp.zeros((8, 2)), width="auto")
    np.testing.assert_allclose(np.asarray(ss2.width), [1.0, 1.0])

    with pytest.raises(ValueError, match='"auto"'):
        SliceSampler(target, init, width="automatic")
