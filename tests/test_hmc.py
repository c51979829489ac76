"""HMC end-to-end tests.

Mirrors the reference's HMC quality checks
(/root/reference/src/hmc.rs:632-787): sampling-moment matching on a
correlated 2D Gaussian, R-hat near 1, plus leapfrog correctness against a
hand-rolled integrator and energy conservation on a quadratic target.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_mcmc_tpu import HMC, init_det, run_stats
from mini_mcmc_tpu.models import diffable_gaussian2d, rosenbrock_nd, standard_normal
from mini_mcmc_tpu.ops.hmc import hmc_kernel


def test_hmc_shapes():
    target = rosenbrock_nd()
    hmc = HMC(target, init_det(4, 3), step_size=0.032, n_leapfrog=10).seed(0)
    sample = hmc.run(400, 50)
    assert sample.shape == (4, 400, 3)


def test_hmc_gaussian_moments():
    mean = np.array([1.0, 2.0])
    cov = np.array([[4.0, 2.0], [2.0, 3.0]])
    target = diffable_gaussian2d(mean, cov)
    hmc = HMC(target, init_det(6, 2), step_size=0.3, n_leapfrog=20).seed(42)
    sample = hmc.run(3000, 500)
    flat = np.asarray(sample).reshape(-1, 2)
    assert np.all(np.abs(flat.mean(axis=0) - mean) < 0.3), flat.mean(axis=0)
    assert np.max(np.abs(np.cov(flat.T) - cov)) < 0.8, np.cov(flat.T)


def test_hmc_rhat_band():
    # R-hat in [0.95, 1.05] on a converged run (hmc.rs:777-787).
    target = diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    hmc = HMC(target, init_det(3, 2), step_size=0.3, n_leapfrog=20).seed(3)
    sample = hmc.run(1000, 200)
    rs = run_stats(sample)
    assert 0.95 <= rs.rhat.mean <= 1.05, rs.rhat


def test_leapfrog_matches_hand_rolled():
    # One HMC leapfrog trajectory equals a straightforward velocity-Verlet
    # integration for the same momenta (validates the cached half-step
    # fusion, hmc.rs:397-431).
    target = standard_normal()
    eps, L = 0.1, 7
    init_fn, _ = hmc_kernel(target, eps, L)
    pos0 = jnp.array([[0.3, -0.5]])
    mom0 = jnp.array([[1.0, 0.2]])

    # hand-rolled
    def grad(p):
        return -p  # standard normal

    pos, mom = np.asarray(pos0[0], np.float64), np.asarray(mom0[0], np.float64)
    for _ in range(L):
        mom = mom + 0.5 * eps * grad(pos)
        pos = pos + eps * mom
        mom = mom + 0.5 * eps * grad(pos)

    state = init_fn(pos0)

    # rebuild the same leapfrog scan the kernel uses
    def leapfrog_scan(pos, mom, logp, grd):
        half = eps * 0.5

        def body(carry, _):
            pos, mom, _, grd = carry
            mom = mom + grd * half
            pos = pos + eps * mom
            logp, grd = target.batch_logp_and_grad(pos)
            mom = mom + grd * half
            return (pos, mom, logp, grd), None

        (pos, mom, logp, grd), _ = jax.lax.scan(
            body, (pos, mom, logp, grd), None, length=L
        )
        return pos, mom

    pos_j, mom_j = leapfrog_scan(state.positions, mom0, state.logp, state.grad)
    np.testing.assert_allclose(np.asarray(pos_j[0]), pos, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mom_j[0]), mom, rtol=1e-5)


def test_hmc_acceptance_high_on_easy_target():
    # With a small step size on a standard normal, nearly all proposals
    # should be accepted => consecutive states differ nearly always.
    target = standard_normal()
    hmc = HMC(target, init_det(16, 2), step_size=0.05, n_leapfrog=5).seed(9)
    sample = np.asarray(hmc.run(200, 50))
    moved = (np.diff(sample, axis=1) != 0).any(axis=-1).mean()
    assert moved > 0.95, moved


def test_hmc_determinism_and_continuation():
    target = rosenbrock_nd()
    a = HMC(target, init_det(4, 3), 0.03, 10).seed(5).run(50, 10)
    b = HMC(target, init_det(4, 3), 0.03, 10).seed(5).run(50, 10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hmc_time_major_layout_is_pure_transpose():
    # time_major=True must change ONLY the layout: same draws, bit-exact,
    # for both the per-step runner and the K-step block runner
    target = rosenbrock_nd()
    cm = HMC(target, init_det(4, 3), 0.03, 10).seed(5).run(50, 10)
    tm = HMC(target, init_det(4, 3), 0.03, 10).seed(5).run(
        50, 10, time_major=True
    )
    assert tm.shape == (50, 4, 3)
    np.testing.assert_array_equal(np.asarray(tm), np.asarray(jnp.swapaxes(cm, 0, 1)))
    cm = HMC(target, init_det(4, 3), 0.03, 10, steps_per_call=5).seed(5).run(50, 10)
    tm = HMC(target, init_det(4, 3), 0.03, 10, steps_per_call=5).seed(5).run(
        50, 10, time_major=True
    )
    np.testing.assert_array_equal(np.asarray(tm), np.asarray(jnp.swapaxes(cm, 0, 1)))


def test_hmc_block_runner_matches_block_fn():
    # the K-step block runner must reproduce exactly what the block
    # function computes, with the same key schedule
    from mini_mcmc_tpu.ops.hmc import hmc_kernel
    from mini_mcmc_tpu.runner import make_block_runner

    target = rosenbrock_nd()
    init_fn, step_fn = hmc_kernel(target, 0.03, 5, steps_per_call=4)
    assert step_fn.block_size == 4
    state = init_fn(init_det(8, 3))
    runner = make_block_runner(step_fn.block_fn, 4)
    key = jax.random.PRNGKey(7)
    out_state, sample, _ = runner(state, key, 8, 4)

    # replay by hand: discard phase (1 block), collect phase (2 blocks)
    state2 = init_fn(init_det(8, 3))
    kd, kc = jax.random.split(key)
    (bk,) = jax.random.split(kd, 1)
    state2, _ = step_fn.block_fn(state2, bk)
    rows = []
    for bk in jax.random.split(kc, 2):
        state2, r = step_fn.block_fn(state2, bk)
        rows.append(r)
    expect = jnp.swapaxes(jnp.concatenate(rows, axis=0), 0, 1)
    np.testing.assert_array_equal(np.asarray(sample), np.asarray(expect))
    np.testing.assert_array_equal(
        np.asarray(out_state.positions), np.asarray(state2.positions)
    )


def test_hmc_steps_per_call_statistics_and_validation():
    import pytest

    target = standard_normal()
    blk = HMC(target, init_det(64, 2), 0.3, 8, steps_per_call=4,
              jitter=0.2).seed(3)
    sample = blk.run(400, 100)
    assert sample.shape == (64, 400, 2)
    flat = np.asarray(sample).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(flat.var(axis=0), [1.0, 1.0], atol=0.15)

    with pytest.raises(ValueError, match="multiples of the block size"):
        blk.run(10, 0)  # 10 % 4 != 0


def test_hmc_block_tracker_updates_per_row():
    from mini_mcmc_tpu import stats as S
    from mini_mcmc_tpu.ops.hmc import hmc_kernel
    from mini_mcmc_tpu.runner import make_block_runner

    target = standard_normal()
    init_fn, step_fn = hmc_kernel(target, 0.3, 8, steps_per_call=4)
    runner = make_block_runner(step_fn.block_fn, 4,
                               tracker_update=S.tracker_update)
    tracker = S.tracker_init(16, 2)
    state, sample, tracker = runner(
        init_fn(init_det(16, 2)), jax.random.PRNGKey(0), 40, 0,
        tracker=tracker,
    )
    # the tracker saw all 40 rows, not 10 block-ends
    assert int(tracker.n) == 40
    assert 0.0 < float(tracker.p_accept) <= 1.0
