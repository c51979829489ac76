"""Rank-normalized diagnostics tests (beyond-reference module).

Property tests against the failure modes the Vehtari et al. 2021
diagnostics were designed to catch — the cases where the classic
(reference-parity) split R-hat in stats.py is blind:

- heavy tails (classic R-hat's moments don't exist for Cauchy chains),
- chains agreeing in location but differing in scale (mean-based
  between-chain variance sees nothing; the FOLDED statistic does).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_mcmc_tpu import rank_normalized_diagnostics


def _iid_normal_cube(c=8, n=2000, p=3, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (c, n, p))


def test_iid_normal_is_converged():
    d = rank_normalized_diagnostics(_iid_normal_cube())
    total = 8 * 2000
    assert float(jnp.max(d.rhat)) < 1.01, np.asarray(d.rhat)
    assert float(jnp.min(d.rhat)) > 0.99, np.asarray(d.rhat)
    # iid draws: bulk and tail ESS on the order of the total draw count
    assert float(jnp.min(d.ess_bulk)) > 0.5 * total, np.asarray(d.ess_bulk)
    assert float(jnp.min(d.ess_tail)) > 0.3 * total, np.asarray(d.ess_tail)


def test_detects_location_shift_under_heavy_tails():
    # standard Cauchy chains, one chain shifted: the classic mean-based
    # R-hat is meaningless (undefined moments — a single extreme draw can
    # swamp the between/within variances in either direction), while the
    # rank-normalized statistic flags the shift reliably
    key = jax.random.PRNGKey(1)
    cube = jax.random.cauchy(key, (4, 4000, 1))
    shifted = cube.at[0].add(10.0)
    d = rank_normalized_diagnostics(shifted)
    assert float(d.rhat[0]) > 1.2, float(d.rhat[0])
    # unshifted control stays converged
    d0 = rank_normalized_diagnostics(cube)
    assert float(d0.rhat[0]) < 1.02, float(d0.rhat[0])


def test_folded_detects_scale_mismatch():
    # two chain groups with the same mean but 10x different spread: the
    # bulk (location) statistic alone underreacts; the folded statistic
    # carries the detection (this is exactly why Stan reports the max)
    key = jax.random.PRNGKey(2)
    cube = jax.random.normal(key, (4, 4000, 1))
    cube = cube.at[0].multiply(10.0)
    d = rank_normalized_diagnostics(cube)
    assert float(d.rhat_folded[0]) > 1.1, float(d.rhat_folded[0])
    assert float(d.rhat[0]) >= float(d.rhat_folded[0]) - 1e-6


def test_autocorrelated_chains_reduce_bulk_ess():
    # AR(1) chains with strong positive correlation: bulk ESS must shrink
    # far below the draw count while R-hat stays near 1 (well-mixed in
    # distribution, slow per-draw information)
    rho, c, n = 0.95, 8, 4000
    key = jax.random.PRNGKey(3)
    innov = np.asarray(jax.random.normal(key, (c, n)))
    x = np.zeros((c, n), np.float32)
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * innov[:, t]
    d = rank_normalized_diagnostics(jnp.asarray(x)[:, :, None])
    total = c * n
    assert float(d.rhat[0]) < 1.02, float(d.rhat[0])
    assert float(d.ess_bulk[0]) < 0.15 * total, float(d.ess_bulk[0])
    # tail ESS shrinks too (sticky tails)
    assert float(d.ess_tail[0]) < 0.3 * total, float(d.ess_tail[0])


def test_time_major_layout_matches_chain_major():
    cube = _iid_normal_cube(c=6, n=500, p=2, seed=4)
    a = rank_normalized_diagnostics(cube)
    b = rank_normalized_diagnostics(jnp.swapaxes(cube, 0, 1),
                                    time_major=True)
    for fa, fb in ((a.rhat, b.rhat), (a.ess_bulk, b.ess_bulk),
                   (a.ess_tail, b.ess_tail)):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   rtol=1e-6)


def test_rank_normalize_matches_scipy_reference():
    # the rank stage must agree with scipy's ordinal ranking + the Blom
    # normal-quantile formula computed independently
    from scipy import stats as sps

    from mini_mcmc_tpu.diagnostics import _rank_normalize_pm

    x = np.random.default_rng(0).normal(size=(3, 500)).astype(np.float32)
    z = np.asarray(_rank_normalize_pm(jnp.asarray(x)))
    for p in range(3):
        r = sps.rankdata(x[p], method="ordinal") - 1  # 0-based
        expect = sps.norm.ppf((r + 1 - 0.375) / (500 + 0.25))
        np.testing.assert_allclose(z[p], expect, rtol=2e-5, atol=2e-6)


def test_rejects_non_cube_input():
    with pytest.raises(ValueError, match="3-D"):
        rank_normalized_diagnostics(jnp.zeros((4, 100)))


def test_str_summary_renders():
    s = str(rank_normalized_diagnostics(_iid_normal_cube(c=4, n=200)))
    assert "rank-normalized R-hat" in s and "bulk ESS" in s


# -- summary() ---------------------------------------------------------------


def test_summary_iid_normal_values():
    from mini_mcmc_tpu import summary

    key = jax.random.PRNGKey(3)
    sample = jax.random.normal(key, (4, 4000, 2))
    s = summary(sample)
    np.testing.assert_allclose(np.asarray(s.mean), [0.0, 0.0], atol=0.05)
    np.testing.assert_allclose(np.asarray(s.sd), [1.0, 1.0], atol=0.05)
    # default quantile levels: 5% / 50% / 95% of N(0, 1)
    np.testing.assert_allclose(
        np.asarray(s.quantiles),
        [[-1.645, -1.645], [0.0, 0.0], [1.645, 1.645]],
        atol=0.08,
    )
    # iid draws: ESS near the sample count, mcse_mean = sd/sqrt(ess)
    assert float(jnp.min(s.ess_bulk)) > 0.8 * 16000
    np.testing.assert_allclose(
        np.asarray(s.mcse_mean),
        np.asarray(s.sd) / np.sqrt(np.asarray(s.ess_bulk)),
        rtol=1e-5,
    )
    assert np.all(np.asarray(s.mcse_sd) > 0)
    assert np.all(np.asarray(s.mcse_sd) < 0.05)
    assert float(jnp.max(s.rhat)) < 1.01
    assert s.names == ("x0", "x1")


def test_summary_table_and_names():
    from mini_mcmc_tpu import summary

    sample = jax.random.normal(jax.random.PRNGKey(4), (2, 500, 2))
    s = summary(sample, param_names=("alpha", "beta"),
                quantiles=(0.25, 0.75))
    text = str(s)
    assert "alpha" in text and "beta" in text
    assert "q25" in text and "q75" in text
    assert "ess_bulk" in text and "rhat" in text
    with pytest.raises(ValueError, match="param_names"):
        summary(sample, param_names=("only_one",))


def test_summary_time_major_matches():
    from mini_mcmc_tpu import summary

    sample = jax.random.normal(jax.random.PRNGKey(5), (4, 300, 3))
    a = summary(sample)
    b = summary(jnp.swapaxes(sample, 0, 1), time_major=True)
    np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean))
    np.testing.assert_allclose(np.asarray(a.ess_bulk),
                               np.asarray(b.ess_bulk))


def test_summary_mcse_shrinks_with_more_draws():
    from mini_mcmc_tpu import summary

    key = jax.random.PRNGKey(6)
    small = summary(jax.random.normal(key, (4, 250, 1)))
    big = summary(jax.random.normal(key, (4, 4000, 1)))
    assert float(big.mcse_mean[0]) < 0.4 * float(small.mcse_mean[0])
    assert float(big.mcse_sd[0]) < 0.4 * float(small.mcse_sd[0])


def test_summary_mcse_sd_finite_on_pathological_chains():
    # Near-deterministic ramps give a split-ESS of x (and x^2) near or
    # below 1; the mcse_sd factor must clamp, not propagate NaN.
    from mini_mcmc_tpu import summary

    t = jnp.arange(64, dtype=jnp.float32)
    cube = jnp.stack([t, t + 0.01])[:, :, None]  # [2, 64, 1] ramps
    s = summary(cube)
    assert np.isfinite(float(s.mcse_sd[0])), float(s.mcse_sd[0])
    assert float(s.mcse_sd[0]) > 0.0
