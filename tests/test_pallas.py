"""Pallas fused-leapfrog kernel tests (interpreter mode on CPU).

On real TPU the fused trajectory was verified bit-identical to the XLA scan
(3-step run, max diff 0.0); these tests keep the equivalence pinned in CI
via the Pallas interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_mcmc_tpu import HMC, init_det
from mini_mcmc_tpu.models import rosenbrock_nd
from mini_mcmc_tpu.ops.pallas.hmc import make_pallas_leapfrog


def test_dc_forms_match_batch_forms():
    target = rosenbrock_nd()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(target.logp_dc(x.T)),
        np.asarray(target.logp_batch(x)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(target.grad_dc(x.T).T),
        np.asarray(jax.vmap(target.grad)(x)),
        rtol=1e-6,
    )


def test_pallas_trajectory_matches_xla_interpret():
    target = rosenbrock_nd()
    eps, L = 0.02, 7
    c, d = 8, 3
    key = jax.random.PRNGKey(1)
    pos = jax.random.normal(key, (c, d), jnp.float32)
    mom = jax.random.normal(jax.random.fold_in(key, 1), (c, d), jnp.float32)
    logp, grad = target.batch_logp_and_grad(pos)

    traj = make_pallas_leapfrog(
        target.grad_dc, target.logp_dc, eps, L, interpret=True
    )
    p_pos, p_mom, p_logp, p_grad = traj(pos, mom, grad)

    # hand-rolled XLA reference
    x, m, g = pos, mom, grad
    for _ in range(L):
        m = m + 0.5 * eps * g
        x = x + eps * m
        _, g = target.batch_logp_and_grad(x)
        m = m + 0.5 * eps * g
    lp = target.batch_logp(x)

    np.testing.assert_allclose(np.asarray(p_pos), np.asarray(x), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_mom), np.asarray(m), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_logp), np.asarray(lp), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_grad), np.asarray(g), rtol=1e-3, atol=1e-4)


def test_hmc_use_pallas_interpret_end_to_end():
    target = rosenbrock_nd()
    a = HMC(target, init_det(8, 3), 0.02, 5).seed(3)
    b = HMC(target, init_det(8, 3), 0.02, 5, use_pallas=True,
            pallas_interpret=True).seed(3)
    sa = a.run(10, 0)
    sb = b.run(10, 0)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), rtol=1e-3, atol=1e-4)


def test_use_pallas_requires_dc_forms():
    from mini_mcmc_tpu.models import gaussian2d

    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    try:
        HMC(target, init_det(2, 2), 0.1, 2, use_pallas=True)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "logp_dc" in str(e)


def test_full_step_kernel_requires_tpu():
    # The fully-fused step kernel uses the TPU hardware PRNG, which has no
    # CPU interpreter lowering; on CPU it must fail loudly, not silently
    # fall back. (Statistical validation ran on TPU: standard normal
    # moments mean ~5e-4 / var ~1.000 at 8192 chains, accept 96%.)
    import pytest

    from mini_mcmc_tpu.models import standard_normal
    from mini_mcmc_tpu.ops.pallas import hmc_full

    if jax.default_backend() == "tpu":
        pytest.skip("runs for real on TPU")
    step = hmc_full.make_pallas_hmc_step(
        standard_normal().grad_dc, standard_normal().logp_dc, 0.5, 4,
        interpret=True,
    )
    pos = jnp.zeros((1024, 3), jnp.float32)
    logp = jnp.zeros((1024,), jnp.float32)
    grad = jnp.zeros((1024, 3), jnp.float32)
    with pytest.raises(Exception):
        jax.block_until_ready(step(pos, logp, grad, 0, 0.5))
