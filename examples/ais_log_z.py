"""Marginal likelihood (model evidence) by annealed importance sampling.

Beyond-reference capability demo (the Rust reference stops at sampling):
the quantity Bayesian model comparison needs — ``p(y) = ∫ p(y|θ) p(θ) dθ``
— is a normalizing constant, invisible to plain MCMC. AIS anneals a
particle population from the prior to the (unnormalized) posterior and
returns an estimate of ``log p(y)``, checked here against the conjugate
Gaussian model's analytic evidence.

Model: θ ~ N(0, 1), y_i | θ ~ N(θ, 1) for n observations. The evidence is
the Gaussian marginal y ~ N(0, I + 1 1ᵀ), available in closed form.
"""

import numpy as np

from mini_mcmc_tpu import ais_log_z
from mini_mcmc_tpu.models.base import Target

Y = np.asarray([0.8, 1.4, -0.3, 1.1, 0.6], np.float32)


def main():
    import jax.numpy as jnp

    y = jnp.asarray(Y)
    n = y.shape[0]

    # Unnormalized posterior = prior * likelihood, WITH their Gaussian
    # constants, so the AIS normalizing constant IS the evidence p(y).
    def batch_logp(theta):  # [N, 1] -> [N]
        t = theta[:, 0]
        log_prior = -0.5 * (t**2 + jnp.log(2 * jnp.pi))
        log_lik = jnp.sum(
            -0.5 * ((y[None, :] - t[:, None]) ** 2 + jnp.log(2 * jnp.pi)),
            axis=1,
        )
        return log_prior + log_lik

    target = Target(logp=lambda x: batch_logp(x[None])[0],
                    logp_batch=batch_logp)

    r = ais_log_z(
        target, n_particles=8192, dim=1, betas=64, n_mh_steps=2,
        proposal_std=0.5, seed=0,
    )

    # Analytic evidence: y ~ N(0, I + 1 1^T).
    cov = np.eye(n) + np.ones((n, n))
    sign, logdet = np.linalg.slogdet(cov)
    quad = float(Y @ np.linalg.solve(cov, Y))
    true = -0.5 * (n * np.log(2 * np.pi) + logdet + quad)

    # The adaptive sibling: no schedule to choose — SMC picks each
    # temperature increment from the population's incremental-weight ESS.
    from mini_mcmc_tpu import smc_log_z

    s = smc_log_z(target, n_particles=8192, dim=1, proposal_std=0.5,
                  seed=0)

    print(f"n = {n} observations, 8192 particles")
    print(f"AIS log evidence      {float(r.log_z):+.4f}  (64 fixed rungs)")
    print(f"SMC log evidence      {float(s.log_z):+.4f}  "
          f"({s.n_stages} adaptive stages)")
    print(f"analytic log evidence {true:+.4f}")
    print(f"AIS weight ESS        {float(r.weight_ess):.2f} "
          "(near 1 = schedule fine enough)")
    assert abs(float(r.log_z) - true) < 0.05
    assert abs(float(s.log_z) - true) < 0.05
    return float(r.log_z)


if __name__ == "__main__":
    main()
