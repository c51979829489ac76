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
