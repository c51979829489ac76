"""Parallel tempering tests (beyond-reference capability).

The headline is the negative-control pair (the reference's own test idiom,
/root/reference/tests/metrohast_2d_gaussian_test.rs:33-92, applied to
multimodality): single-temperature MH started in one mode of a
well-separated mixture never finds the other mode's 70% of the mass, while
replica exchange on the same budget recovers the mode weights. Plus cold-
chain exactness on a Gaussian, the raw-logp cache surviving swap sweeps,
determinism, bit-exact checkpoint continuation, and ladder validation.
"""

import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from mini_mcmc_tpu import (
    MetropolisHastings,
    ParallelTempering,
    geometric_betas,
    init_with_seed,
)
from mini_mcmc_tpu.checkpoint import restore_sampler, save_sampler
from mini_mcmc_tpu.models import isotropic_gaussian_proposal
from mini_mcmc_tpu.models.base import Target

# 0.3 * N(-8, 0.5^2) + 0.7 * N(+8, 0.5^2): modes 32 proposal-sigmas apart.
_W_PLUS = 0.7


def _bimodal_target():
    def logp(x):
        a = jnp.log(1 - _W_PLUS) - 0.5 * ((x[0] + 8.0) / 0.5) ** 2
        b = jnp.log(_W_PLUS) - 0.5 * ((x[0] - 8.0) / 0.5) ** 2
        return jax_logaddexp(a, b)

    def logp_batch(xs):
        a = jnp.log(1 - _W_PLUS) - 0.5 * ((xs[:, 0] + 8.0) / 0.5) ** 2
        b = jnp.log(_W_PLUS) - 0.5 * ((xs[:, 0] - 8.0) / 0.5) ** 2
        return jnp.logaddexp(a, b)

    return Target(logp=logp, logp_batch=logp_batch)


def jax_logaddexp(a, b):
    return jnp.logaddexp(a, b)


def test_mode_weight_recovery_vs_single_temperature_negative_control():
    target = _bimodal_target()
    init = jnp.full((64, 1), -8.0)

    # Negative control: plain MH never crosses the 16-unit barrier.
    mh = MetropolisHastings(
        target, isotropic_gaussian_proposal(1.0), init
    ).seed(1)
    stuck = np.asarray(mh.run(3000, 1000))
    assert np.mean(stuck > 0) < 0.05

    # Replica exchange on the same target and start recovers the weights.
    pt = ParallelTempering(
        target, init, betas=geometric_betas(8, 0.01), proposal_std=1.0
    ).seed(1)
    sample = np.asarray(pt.run(3000, 1000))
    assert sample.shape == (64, 3000, 1)
    w_plus = float(np.mean(sample > 0))
    assert abs(w_plus - _W_PLUS) < 0.12, w_plus
    # and the within-mode geometry is right, not just the split
    plus = sample[sample > 0]
    np.testing.assert_allclose(plus.mean(), 8.0, atol=0.1)
    np.testing.assert_allclose(plus.std(), 0.5, atol=0.1)
    # the streaming swap diagnostic is alive and in a sane range
    rates = np.asarray(pt.swap_acceptance)
    assert rates.shape == (7,)
    assert np.all(rates > 0.05) and np.all(rates <= 1.0), rates


def test_cold_chain_gaussian_moments():
    target = Target(logp=lambda x: -0.5 * jnp.sum(x * x))
    pt = ParallelTempering(
        target, init_with_seed(32, 2, seed=0), betas=(1.0, 0.5, 0.25),
        proposal_std=2.4,
    ).seed(3)
    sample = np.asarray(pt.run(4000, 500)).reshape(-1, 2)
    np.testing.assert_allclose(sample.mean(axis=0), [0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(sample.var(axis=0), [1.0, 1.0], atol=0.12)


def test_raw_logp_cache_consistent_after_swaps():
    # A stale cache after the swap permutation would silently corrupt
    # every subsequent accept decision — pin cache == fresh evaluation.
    target = _bimodal_target()
    pt = ParallelTempering(
        target, jnp.full((8, 1), -8.0), betas=geometric_betas(4, 0.05)
    ).seed(7)
    pt.run(200, 0)
    import jax

    # positions are [T, D, C] chains-on-lanes; evaluate per rung
    fresh = jax.vmap(lambda p: target.batch_logp(p.T))(pt.state.positions)
    np.testing.assert_allclose(
        np.asarray(pt.state.raw_logp), np.asarray(fresh), rtol=1e-6
    )


def test_determinism_and_cold_rows_extraction():
    target = Target(logp=lambda x: -0.5 * jnp.sum(x * x))
    init = init_with_seed(8, 3, seed=2)

    def make():
        return ParallelTempering(target, init, betas=(1.0, 0.5)).seed(11)

    a, b = np.asarray(make().run(64, 8)), np.asarray(make().run(64, 8))
    np.testing.assert_array_equal(a, b)
    pt = make()
    assert pt.n_chains == 8
    assert pt.n_replicas == 16
    assert pt.positions.shape == (8, 3)


def test_checkpoint_resume_bitexact():
    target = _bimodal_target()
    init = jnp.full((4, 1), -8.0)
    betas = geometric_betas(4, 0.05)
    with tempfile.TemporaryDirectory() as tmp:
        path = tmp + "/pt_ckpt"
        a = ParallelTempering(target, init, betas=betas).seed(6)
        a.run(40, 0)
        save_sampler(path, a)
        cont_a = a.run(60, 0)

        b = ParallelTempering(target, init, betas=betas).seed(4321)
        restore_sampler(path, b)
        cont_b = b.run(60, 0)
    np.testing.assert_array_equal(np.asarray(cont_a), np.asarray(cont_b))


def test_ladder_validation():
    target = Target(logp=lambda x: -0.5 * jnp.sum(x * x))
    init = init_with_seed(4, 2, seed=0)
    with pytest.raises(ValueError, match="betas\\[0\\] must be 1.0"):
        ParallelTempering(target, init, betas=(0.9, 0.5))
    with pytest.raises(ValueError, match="strictly decreasing"):
        ParallelTempering(target, init, betas=(1.0, 0.5, 0.5))
    with pytest.raises(ValueError, match=">= 2 temperatures"):
        ParallelTempering(target, init, betas=(1.0,))
    with pytest.raises(ValueError, match="beta_min"):
        geometric_betas(4, 1.5)
    with pytest.raises(ValueError, match="n_temps"):
        geometric_betas(1)


def test_block_path_and_run_progress_smoke():
    import io

    target = Target(logp=lambda x: -0.5 * jnp.sum(x * x))
    pt = ParallelTempering(
        target, init_with_seed(8, 2, seed=1), betas=(1.0, 0.5, 0.25),
        steps_per_call=4,
    ).seed(5)
    sample = pt.run(256, 64)
    assert sample.shape == (8, 256, 2)
    stream = io.StringIO()
    sample2, stats = pt.run_progress(64, 16, stream=stream)
    assert sample2.shape == (8, 64, 2)
    assert len(stream.getvalue()) > 0


def test_tune_betas_equal_rates_is_identity():
    from mini_mcmc_tpu import tune_betas

    betas = geometric_betas(6, 0.02)
    tuned = tune_betas(betas, [0.4] * 5)
    # equal per-pair rejection => equal barrier increments => knots stay
    np.testing.assert_allclose(tuned, betas, rtol=1e-9)


def test_tune_betas_moves_knots_toward_bottleneck():
    from mini_mcmc_tpu import tune_betas

    betas = (1.0, 0.75, 0.5, 0.25)
    # pair 0 rejects everything (the bottleneck), the rest always accept:
    # tuned interior knots must crowd into the (1.0, 0.75] segment
    tuned = tune_betas(betas, [0.0, 1.0, 1.0])
    assert tuned[0] == 1.0 and tuned[-1] == 0.25
    assert all(b > 0.75 - 1e-6 for b in tuned[1:-1]), tuned
    assert all(b2 < b1 for b1, b2 in zip(tuned, tuned[1:])), tuned


def test_tune_betas_resize_and_validation():
    from mini_mcmc_tpu import tune_betas

    betas = geometric_betas(4, 0.05)
    up = tune_betas(betas, [0.3, 0.3, 0.3], n_temps=7)
    assert len(up) == 7 and up[0] == 1.0 and abs(up[-1] - 0.05) < 1e-12
    assert all(b2 < b1 for b1, b2 in zip(up, up[1:]))
    with pytest.raises(ValueError, match="length"):
        tune_betas(betas, [0.3, 0.3])
    with pytest.raises(ValueError, match="n_temps"):
        tune_betas(betas, [0.3, 0.3, 0.3], n_temps=1)


def test_tune_betas_end_to_end_equalizes_swap_rates():
    # a deliberately bad ladder (huge gap at the cold end) -> one
    # run/tune round must shrink the spread of per-pair swap rates
    from mini_mcmc_tpu import tune_betas

    target = _bimodal_target()
    init = jnp.full((64, 1), -8.0)
    bad = (1.0, 0.03, 0.02, 0.015, 0.012, 0.01)

    def rates(betas):
        pt = ParallelTempering(target, init, betas=betas).seed(9)
        pt.run(1500, 500)
        return np.asarray(pt.swap_acceptance)

    r0 = rates(bad)
    tuned = tune_betas(bad, r0)
    r1 = rates(tuned)  # round 1: the bottleneck pair must open up
    assert r1.min() > r0.min() + 0.1, (r0, r1)
    r2 = rates(tune_betas(tuned, r1))  # round 2: spread collapses
    assert r2.std() < 0.5 * r0.std(), (r0, r1, r2)
    assert r2.min() > r0.min() + 0.1, (r0, r2)


def test_retuned_continues_and_equalizes():
    # the sampler-level run -> retuned() -> run workflow: continues from
    # the cold ensemble, re-spaces the ladder, and is seed-reproducible
    target = _bimodal_target()
    init = jnp.full((32, 1), -8.0)
    bad = (1.0, 0.03, 0.02, 0.015, 0.012, 0.01)

    pt = ParallelTempering(target, init, betas=bad).seed(9)
    pt.run(1200, 400)
    r0 = np.asarray(pt.swap_acceptance)
    pt2 = pt.retuned()
    assert pt2.betas[0] == 1.0 and pt2.betas[-1] == bad[-1]
    assert pt2.betas != bad
    # continuation starts from the parent's cold ensemble
    np.testing.assert_array_equal(
        np.asarray(pt2.positions), np.asarray(pt.positions)
    )
    pt2.run(1200, 400)
    r1 = np.asarray(pt2.swap_acceptance)
    assert r1.min() > r0.min() + 0.1, (r0, r1)

    # resizing + deterministic derivation from the parent stream
    pt3 = pt.retuned(n_temps=4)
    assert len(pt3.betas) == 4


def test_block_fn_contract_cold_rows_only():
    # the XLA K-step block must equal K applications of step_fn on the
    # block key's K sub-keys, recording the COLD rung in the user [C, D]
    # layout inside the scan (rows_mapped=True) — never the full
    # [K, T, D, C] replica stack (a T-times transient HBM spike).
    import jax

    from mini_mcmc_tpu.models.base import Target
    from mini_mcmc_tpu.ops.tempering import tempering_kernel

    target = Target(logp=lambda x: -0.5 * jnp.sum(x * x))
    init_fn, step_fn = tempering_kernel(
        target, (1.0, 0.5, 0.25), proposal_std=1.0, steps_per_call=4
    )
    assert getattr(step_fn.block_fn, "rows_mapped", False)
    state = init_fn(init_with_seed(6, 2, seed=1))
    key = jax.random.PRNGKey(3)
    out_state, rows = step_fn.block_fn(state, key)
    assert rows.shape == (4, 6, 2)

    s = state
    expected = []
    for sub in jax.random.split(key, 4):
        s = step_fn(s, sub)
        expected.append(np.asarray(s.positions[0].T))
    # allclose, not equal: XLA fuses the proposal arithmetic differently
    # inside lax.scan than in eager per-step execution (~1e-7 fma noise)
    np.testing.assert_allclose(np.asarray(rows), np.stack(expected),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_state.positions),
                               np.asarray(s.positions), rtol=0, atol=1e-5)
