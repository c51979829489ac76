"""Timer and profiling helper coverage (reference dev_tools::Timer,
/root/reference/src/dev_tools.rs)."""

import jax.numpy as jnp

from mini_mcmc_tpu.utils import Timer, profiling


def test_timer_logs_elapsed(capsys):
    t = Timer()
    elapsed = t.log("phase one")
    out = capsys.readouterr().out
    assert "phase one" in out and "ms" in out
    assert elapsed >= 0.0
    t.reset()
    assert t.log("phase two") >= 0.0


def test_step_timer_blocks_and_times():
    result, secs = profiling.step_timer(
        lambda x: jnp.sum(x * x), jnp.ones((64, 64)), repeats=2
    )
    assert float(result) == 64.0 * 64.0
    assert secs >= 0.0


def test_lgamma_lanczos_accuracy():
    # the Mosaic-compatible Lanczos log-gamma used by the discrete targets'
    # fused-Pallas forms (utils/mathx): <= 3e-4 absolute on the small-z
    # range where lgamma crosses zero (the realistic Poisson/Binomial k
    # range), few-fp32-ulp relative everywhere else
    import jax
    from mini_mcmc_tpu.utils.mathx import lgamma_positive

    z = jnp.arange(1.0, 5000.0, 0.37, jnp.float32)
    ours = lgamma_positive(z)
    exact = jax.lax.lgamma(z)
    abs_err = jnp.abs(ours - exact)
    assert float(jnp.max(jnp.where(z <= 200.0, abs_err, 0.0))) < 3e-4
    rel = abs_err / jnp.maximum(jnp.abs(exact), 1.0)
    assert float(jnp.max(jnp.where(z > 20.0, rel, 0.0))) < 1e-5


def test_chain_keys_independent_and_deterministic():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mini_mcmc_tpu import chain_keys

    keys = chain_keys(jax.random.PRNGKey(7), 16)
    assert keys.shape[0] == 16
    # deterministic
    keys2 = chain_keys(jax.random.PRNGKey(7), 16)
    np.testing.assert_array_equal(np.asarray(keys), np.asarray(keys2))
    # all distinct, and the draws they produce are uncorrelated
    raw = np.asarray(jax.vmap(jax.random.key_data)(keys)) if hasattr(
        jax.random, "key_data") else np.asarray(keys)
    assert len({tuple(r.ravel().tolist()) for r in raw}) == 16
    draws = np.asarray(
        jax.vmap(lambda k: jax.random.normal(k, (256,)))(keys)
    )
    corr = np.corrcoef(draws)
    off = corr[~np.eye(16, dtype=bool)]
    assert np.max(np.abs(off)) < 0.25, np.max(np.abs(off))
