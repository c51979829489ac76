"""Large-N Bayesian logistic regression with minibatch SGLD.

Beyond the reference (its gradient samplers all need exact full-data
gradients, /root/reference/src/hmc.rs:36-432): stochastic-gradient
Langevin dynamics touches only a ``batch_size``-row minibatch per step,
so the per-step cost is O(B * D) regardless of how large the dataset
grows — the regime where full-gradient MCMC stops being an option.

The likelihood receives the WHOLE minibatch at once, so it is one
``[B, D] @ [D]`` matmul which, vmapped over the ``[C, D]`` chain batch,
becomes a single MXU contraction per step. A polynomially decaying step
size (Welling & Teh 2011) shrinks the discretization bias as the run
proceeds; a full-gradient MALA run on the same posterior is the exact
yardstick the SGLD moments are checked against.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_mcmc_tpu import (
    MALA,
    SGLD,
    init_det,
    minibatch_grad,
    polynomial_decay,
    summary,
)
from mini_mcmc_tpu.models.base import Target


def make_data(n_points, dim, seed=0):
    key = jax.random.PRNGKey(seed)
    k_x, k_y = jax.random.split(key)
    true_beta = jnp.asarray(np.linspace(-1.0, 1.0, dim), jnp.float32)
    X = jax.random.normal(k_x, (n_points, dim), jnp.float32)
    p = jax.nn.sigmoid(X @ true_beta)
    y = (jax.random.uniform(k_y, (n_points,)) < p).astype(jnp.float32)
    return X, y, true_beta


def main(n_points=8192, dim=4, n_chains=32, batch_size=256, seed=0):
    X, y, true_beta = make_data(n_points, dim, seed)
    prior_std = 10.0
    inv_prior_var = 1.0 / (prior_std * prior_std)

    # --- minibatch SGLD: O(B) data touched per step ------------------
    grad_fn = minibatch_grad(
        lambda b: -0.5 * inv_prior_var * jnp.sum(b * b),
        # summed minibatch log-likelihood: one [B, D] @ [D] matmul
        lambda b, batch: jnp.sum(
            batch[1] * (batch[0] @ b) - jax.nn.softplus(batch[0] @ b)
        ),
        (X, y),
        batch_size=batch_size,
    )
    sgld = SGLD(
        grad_fn,
        init_det(n_chains, dim),
        # decaying schedule: bias -> 0 as eps -> 0 (Welling & Teh eq. 2)
        step_size=polynomial_decay(2e-4, 100.0, 0.55),
        seed=42,
    )
    sgld_sample = sgld.run(2000, 2000)
    sgld_mean = np.asarray(sgld_sample).reshape(-1, dim).mean(axis=0)

    # --- full-gradient MALA yardstick (exact, O(N) per step) ---------
    def logp(beta):
        z = X @ beta  # [N]
        loglik = jnp.sum(y * z - jax.nn.softplus(z))
        return loglik - 0.5 * inv_prior_var * jnp.sum(beta * beta)

    def logp_batch(betas):
        z = betas @ X.T  # [C, N] MXU matmul
        loglik = jnp.sum(y[None, :] * z - jax.nn.softplus(z), axis=1)
        return loglik - 0.5 * inv_prior_var * jnp.sum(betas * betas, axis=1)

    target = Target(logp=logp, logp_batch=logp_batch)
    mala = MALA(target, init_det(n_chains, dim), 0.02, seed=42).tuned(500)
    mala_sample = mala.run(2000, 500)
    mala_mean = np.asarray(mala_sample).reshape(-1, dim).mean(axis=0)
    mala_std = np.asarray(mala_sample).reshape(-1, dim).std(axis=0)

    print(f"data: N={n_points}, minibatch B={batch_size} "
          f"({100.0 * batch_size / n_points:.1f}% touched per step)")
    print("true beta:      ", np.asarray(true_beta))
    print("SGLD post mean: ", sgld_mean)
    print("MALA post mean: ", mala_mean)
    print(summary(sgld_sample,
                  param_names=[f"beta[{i}]" for i in range(dim)]))

    # SGLD must land on the exact sampler's posterior (small O(eps) bias)
    assert np.all(np.abs(sgld_mean - mala_mean) < 4.0 * mala_std + 0.05), (
        sgld_mean, mala_mean, mala_std)
    return sgld_mean


if __name__ == "__main__":
    main()
