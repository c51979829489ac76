"""ChEES-HMC trajectory-length adaptation tests (ops/chees.py).

Beyond-reference (the reference's HMC trajectory length is fixed forever,
/root/reference/src/hmc.rs:87-109): ChEES (Hoffman, Radul & Sountsov 2021)
adapts the trajectory length from a cross-chain criterion — the lockstep
alternative to NUTS. Pinned here: the Halton jitter sequence, adaptation
growing the trajectory toward the target's longest timescale, joint
eps+T convergence (acceptance near target), end-to-end sampling quality,
the reproducibility/continuation contracts shared by every sampler, and
checkpoint round-tripping (the state is a plain ops/hmc.py HMCState).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_mcmc_tpu import ChEESHMC, init_det, init_with_seed, run_stats
from mini_mcmc_tpu.models import diffable_gaussian2d, standard_normal
from mini_mcmc_tpu.ops.chees import chees_adapt, chees_hmc_kernel, halton_u
from mini_mcmc_tpu.ops.hmc import hmc_kernel


def _wide_gaussian():
    # sigma = (1, 4): the slow coordinate's timescale is 4x the fast one's,
    # so a one-leapfrog trajectory is badly short and adaptation must grow T.
    return diffable_gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 16.0]])


def test_halton_base2_radical_inverse():
    got = [float(halton_u(jnp.asarray(m))) for m in range(1, 9)]
    want = [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875, 0.0625]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_halton_is_traceable_and_in_unit_interval():
    us = jax.jit(jax.vmap(halton_u))(jnp.arange(1, 4097))
    assert float(jnp.min(us)) > 0.0 and float(jnp.max(us)) < 1.0
    # equidistribution: mean of a (0,1) low-discrepancy sequence ~ 1/2
    assert abs(float(jnp.mean(us)) - 0.5) < 1e-3


def test_adaptation_grows_trajectory_and_hits_target_accept():
    target = _wide_gaussian()
    ch = ChEESHMC(target, init_with_seed(256, 2, seed=0), step_size=0.2,
                  seed=42)
    assert ch.traj_len == 0.2  # default: one leapfrog
    new = ch.warmed_up(300)
    # T must grow far beyond the single-step init toward the slow
    # coordinate's O(sigma_max) timescale (pi*sigma_max ~ 12.6; the ChEES
    # optimum sits below that — band chosen 3x wide on each side).
    assert 2.0 < new.traj_len < 40.0, new.traj_len
    assert new.traj_len > 5 * ch.traj_len
    alpha_tail = float(jnp.mean(new.warmup_trace["alpha"][-100:]))
    assert 0.45 < alpha_tail < 0.85, alpha_tail
    # the trace records the full adaptation path
    assert new.warmup_trace["traj_len"].shape == (300,)
    assert new.warmup_trace["eps"].shape == (300,)


def test_sampling_moments_after_warmup():
    target = _wide_gaussian()
    ch = ChEESHMC(target, init_with_seed(256, 2, seed=1), step_size=0.2,
                  seed=3).warmed_up(300)
    cube = ch.run(500, 100)
    assert cube.shape == (256, 500, 2)
    flat = np.asarray(cube).reshape(-1, 2)
    assert np.all(np.abs(flat.mean(axis=0)) < 0.3), flat.mean(axis=0)
    np.testing.assert_allclose(flat.var(axis=0), [1.0, 16.0], rtol=0.25)
    stats = run_stats(cube)
    assert stats.rhat.max < 1.05, stats.rhat


def test_seeded_reproducibility_end_to_end():
    target = _wide_gaussian()

    def one():
        ch = ChEESHMC(target, init_det(32, 2), step_size=0.3, seed=9)
        ch = ch.warmed_up(100)
        return ch.step_size, ch.traj_len, ch.run(50, 0)

    eps_a, t_a, cube_a = one()
    eps_b, t_b, cube_b = one()
    assert eps_a == eps_b and t_a == t_b
    np.testing.assert_array_equal(np.asarray(cube_a), np.asarray(cube_b))


def test_kernel_contract_and_lockstep_shapes():
    target = standard_normal()
    init_fn, step_fn = chees_hmc_kernel(target, step_size=0.5, traj_len=2.0)
    state = init_fn(init_det(8, 3))
    out = jax.jit(step_fn)(state, jax.random.PRNGKey(0))
    assert out.positions.shape == (8, 3)
    assert out.logp.shape == (8,)
    assert out.grad.shape == (8, 3)
    # cached logp/grad stay consistent with positions (the HMCState
    # invariant every downstream kernel relies on)
    logp, grad = target.batch_logp_and_grad(out.positions)
    np.testing.assert_allclose(np.asarray(out.logp), np.asarray(logp),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.grad), np.asarray(grad),
                               rtol=1e-5)


def test_max_leapfrog_caps_the_while_loop():
    # A huge traj_len with a tiny eps must still terminate: the leapfrog
    # count is clamped to max_leapfrog.
    target = standard_normal()
    init_fn, step_fn = chees_hmc_kernel(target, step_size=0.01,
                                        traj_len=1e6, max_leapfrog=16)
    state = init_fn(init_det(4, 2))
    out = step_fn(state, jax.random.PRNGKey(1))
    assert bool(jnp.all(jnp.isfinite(out.positions)))


def test_chees_adapt_rejects_bad_args():
    target = standard_normal()
    init_fn, _ = hmc_kernel(target, 0.1, 1)
    state = init_fn(init_det(4, 2))
    try:
        chees_adapt(target, state, jax.random.PRNGKey(0), 0, 0.1)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_kernel_rejects_bad_args():
    target = standard_normal()
    for kwargs in (dict(step_size=0.0, traj_len=1.0),
                   dict(step_size=0.1, traj_len=0.0)):
        try:
            chees_hmc_kernel(target, **kwargs)
            assert False, "expected ValueError"
        except ValueError:
            pass


def test_reconditioned_rescales_both_time_scales():
    target = _wide_gaussian()
    ch = ChEESHMC(target, init_with_seed(512, 2, seed=2), step_size=0.2,
                  seed=5).warmed_up(200)
    pre = ch.reconditioned("diag")
    assert pre.metric is not None
    # whitened units: both eps and T divide by the new metric's sigma_min
    scale = float(pre.metric.sigma_min())
    np.testing.assert_allclose(pre.step_size, ch.step_size / scale,
                               rtol=1e-6)
    np.testing.assert_allclose(pre.traj_len, ch.traj_len / scale, rtol=1e-6)
    # and the whitened sampler still samples the same target
    cube = pre.warmed_up(150).run(300, 50)
    flat = np.asarray(cube).reshape(-1, 2)
    np.testing.assert_allclose(flat.var(axis=0), [1.0, 16.0], rtol=0.3)


def test_checkpoint_roundtrip_continues_bitwise(tmp_path):
    from mini_mcmc_tpu.checkpoint import restore_sampler, save_sampler

    target = standard_normal()
    ch = ChEESHMC(target, init_det(8, 2), step_size=0.5, traj_len=1.5,
                  seed=11)
    ch.run(20, 0)
    path = str(tmp_path / "chees.ckpt")
    save_sampler(path, ch)
    cont = ch.run(30, 0)

    fresh = ChEESHMC(target, init_det(8, 2), step_size=0.5, traj_len=1.5,
                     seed=0)
    restore_sampler(path, fresh)
    resumed = fresh.run(30, 0)
    np.testing.assert_array_equal(np.asarray(cont), np.asarray(resumed))
