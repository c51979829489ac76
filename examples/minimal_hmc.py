"""Minimal batched HMC on the N-D Rosenbrock (3D).

Analog of /root/reference/examples/minimal_hmc.rs.
"""

from mini_mcmc_tpu import HMC, init_det
from mini_mcmc_tpu.models import rosenbrock_nd


def main():
    target = rosenbrock_nd()
    sampler = HMC(target, init_det(4, 3), step_size=0.032, n_leapfrog=10)
    sample = sampler.run(400, 50)
    print("collected sample with shape:", sample.shape)


if __name__ == "__main__":
    main()
