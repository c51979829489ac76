"""MH on a custom user-defined target (2D Rosenbrock density).

Analog of /root/reference/examples/rosenbrock_mh.rs: demonstrates writing a
target as a plain log-density function (the reference implements the
``Target`` trait by hand; here a pure function suffices).
"""

import numpy as np

from mini_mcmc_tpu import MetropolisHastings, init_det
from mini_mcmc_tpu.models import isotropic_gaussian_proposal
from mini_mcmc_tpu.models.base import Target


def main():
    # A custom target is just a function [D] -> scalar.
    def rosenbrock_logp(pos):
        x, y = pos[0], pos[1]
        return -((1.0 - x) ** 2 + 100.0 * (y - x * x) ** 2) / 20.0

    target = Target(logp=rosenbrock_logp)
    proposal = isotropic_gaussian_proposal(0.5)
    mh = MetropolisHastings(target, proposal, init_det(8, 2)).seed(0)
    sample = mh.run(5000, 1000)

    flat = np.asarray(sample).reshape(-1, 2)
    print("sample shape:", sample.shape)
    print("x mean/std:", flat[:, 0].mean(), flat[:, 0].std())
    print("y mean/std:", flat[:, 1].mean(), flat[:, 1].std())


if __name__ == "__main__":
    main()
