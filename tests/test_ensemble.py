"""Affine-invariant ensemble sampler tests (beyond-reference capability).

The stretch move's defining property — affine equivariance — is pinned
draw-for-draw: pushing the target and the initial ensemble through an
invertible affine map maps the whole sampled trajectory through the same
map (Goodman & Weare 2010). Plus moment matching on the reference's
correlated-Gaussian band target, partner isolation between independent
ensembles, determinism, bit-exact checkpoint continuation, and the K-sweep
block path.
"""

import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from mini_mcmc_tpu import EnsembleSampler, init_with_seed, split_rhat_mean_ess
from mini_mcmc_tpu.checkpoint import restore_sampler, save_sampler
from mini_mcmc_tpu.models import gaussian2d
from mini_mcmc_tpu.models.base import Target


def _std_normal(dim):
    del dim
    return Target(logp=lambda x: -0.5 * jnp.sum(x * x))


def test_affine_equivariance_draw_for_draw():
    d = 3
    ell = jnp.array(
        [[2.0, 0.0, 0.0], [0.7, 0.5, 0.0], [-0.3, 1.2, 3.0]], jnp.float64
    )
    m = jnp.array([1.0, -2.0, 0.5], jnp.float64)
    ell_inv = jnp.linalg.inv(ell)
    t1 = _std_normal(d)
    t2 = Target(
        logp=lambda y: -0.5 * jnp.sum((ell_inv @ (y - m)) ** 2)
    )
    init = jnp.asarray(init_with_seed(16, d, seed=0), jnp.float64)
    s1 = EnsembleSampler(t1, init).seed(9)
    s2 = EnsembleSampler(t2, init @ ell.T + m).seed(9)
    a = np.asarray(s1.run(200, 0))
    b = np.asarray(s2.run(200, 0))
    # identical z/partner/uniform streams + affine equivariance of the
    # move => identical accept decisions => the trajectories correspond
    # exactly under the map (up to float round-off)
    np.testing.assert_allclose(
        b, a @ np.asarray(ell).T + np.asarray(m), rtol=1e-9, atol=1e-9
    )


def test_ensemble_moments_correlated_gaussian():
    # The reference band-target family ([0,1], [[4,2],[2,3]],
    # /root/reference/src/hmc.rs:632-700): the affine-invariant move needs
    # no tuning to sample a correlated, anisotropic target.
    target = gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    es = EnsembleSampler(target, init_with_seed(64, 2, seed=1)).seed(2)
    sample = np.asarray(es.run(4000, 1000))
    flat = sample.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 1.0], atol=0.15)
    cov = np.cov(flat.T)
    np.testing.assert_allclose(
        cov, [[4.0, 2.0], [2.0, 3.0]], rtol=0.15, atol=0.15
    )
    rhat, ess = split_rhat_mean_ess(jnp.asarray(sample))
    assert float(jnp.max(rhat)) < 1.05
    assert float(jnp.min(ess)) > 500.0


def test_independent_ensembles_do_not_share_partners():
    # Two ensembles pinned in two far-apart wells: partner draws never
    # cross ensemble boundaries, so each ensemble keeps sampling its own
    # well at a healthy acceptance rate (cross-ensemble partners would
    # propose into the barrier and collapse acceptance).
    target = Target(
        logp=lambda x: -50.0
        * jnp.sum(jnp.minimum((x - 10.0) ** 2, (x + 10.0) ** 2))
    )
    noise = 0.2 * init_with_seed(16, 1, seed=7)
    init = jnp.concatenate([10.0 + noise[:8], -10.0 + noise[8:]])
    es = EnsembleSampler(target, init, walkers_per_ensemble=8).seed(3)
    s = np.asarray(es.run(300, 50))
    assert np.all(s[:8] > 5.0)
    assert np.all(s[8:] < -5.0)
    move_rate = np.mean(s[:, 1:] != s[:, :-1])
    assert move_rate > 0.3, move_rate


def test_determinism_same_seed():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    runs = [
        np.asarray(
            EnsembleSampler(target, init_with_seed(8, 2, seed=4))
            .seed(11)
            .run(64, 8)
        )
        for _ in range(2)
    ]
    np.testing.assert_array_equal(runs[0], runs[1])


def test_checkpoint_resume_bitexact():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.5], [0.5, 2.0]])
    init = init_with_seed(8, 2, seed=0)
    with tempfile.TemporaryDirectory() as tmp:
        path = tmp + "/es_ckpt"
        a = EnsembleSampler(target, init).seed(6)
        a.run(40, 0)
        save_sampler(path, a)
        cont_a = a.run(60, 0)

        b = EnsembleSampler(target, init).seed(4321)
        restore_sampler(path, b)
        cont_b = b.run(60, 0)
    np.testing.assert_array_equal(np.asarray(cont_a), np.asarray(cont_b))


def test_block_path_runs_and_matches_moments():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    es = EnsembleSampler(
        target, init_with_seed(32, 2, seed=2), steps_per_call=4
    ).seed(5)
    sample = np.asarray(es.run(2000, 400))
    assert sample.shape == (32, 2000, 2)
    np.testing.assert_allclose(
        sample.reshape(-1, 2).mean(axis=0), [0.0, 0.0], atol=0.15
    )
    np.testing.assert_allclose(
        sample.reshape(-1, 2).var(axis=0), [1.0, 1.0], atol=0.2
    )


def test_constructor_validation():
    target = _std_normal(2)
    init = init_with_seed(8, 2, seed=0)
    with pytest.raises(ValueError, match="even and >= 4"):
        EnsembleSampler(target, init, walkers_per_ensemble=6 + 1)
    with pytest.raises(ValueError, match="even and >= 4"):
        EnsembleSampler(target, init, walkers_per_ensemble=2)
    with pytest.raises(ValueError, match="multiple"):
        EnsembleSampler(target, init, walkers_per_ensemble=6)
    with pytest.raises(ValueError, match="a must be > 1"):
        EnsembleSampler(target, init, a=1.0)


def test_run_progress_smoke():
    import io

    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    es = EnsembleSampler(target, init_with_seed(8, 2, seed=3)).seed(7)
    stream = io.StringIO()
    sample, stats = es.run_progress(128, 32, stream=stream)
    assert sample.shape == (8, 128, 2)
    assert "p(accept)" in stream.getvalue() or len(stream.getvalue()) > 0


def test_small_ensemble_on_high_dim_target_rejected():
    # stretch proposals are confined to the ensemble's affine hull, which
    # w walkers cap at dim w-1 and which never grows: w < D+2 would sample
    # a proper subspace with healthy-looking diagnostics. Must be a hard
    # init-time error, not a silent wrong posterior.
    target = _std_normal(10)
    with pytest.raises(ValueError, match="affine hull"):
        EnsembleSampler(target, init_with_seed(8, 10, seed=2),
                        walkers_per_ensemble=8)
    # D+2 exactly is allowed
    EnsembleSampler(target, init_with_seed(12, 10, seed=2),
                    walkers_per_ensemble=12)
