"""Metric (mass-matrix) adaptation from the chain ensemble.

Beyond the reference (which has no metric): equilibrate a NUTS ensemble,
whiten from ONE cross-chain covariance snapshot
(``sampler.reconditioned("dense")``), and continue sampling the original
coordinates with the whitened dynamics. See docs/design.md "Metric
adaptation as a coordinate transform".
"""

import jax.numpy as jnp

from mini_mcmc_tpu import NUTS, init_det, split_rhat_mean_ess
from mini_mcmc_tpu.models import diffable_gaussian2d


def main():
    target = diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    nuts = NUTS(target, init_det(256, 2), 0.8).seed(0)

    nuts.run(100, 200)  # adapt step size + equilibrate the ensemble
    tuned = nuts.reconditioned("dense", seed=1)
    sample = tuned.run(500, 100)

    rhat, ess = split_rhat_mean_ess(sample)
    print("estimated covariance factor L:\n", tuned.metric.chol)
    print("sample shape:", sample.shape)
    print("mean:", jnp.mean(sample, axis=(0, 1)),
          "var:", jnp.var(sample, axis=(0, 1)))
    print("split R-hat:", rhat, "ESS:", ess)


if __name__ == "__main__":
    main()
