"""Minimal NUTS on the 2D Rosenbrock with progress and diagnostics.

Analog of /root/reference/examples/minimal_nuts.rs.
"""

from mini_mcmc_tpu import NUTS, init
from mini_mcmc_tpu.models import rosenbrock2d


def main():
    target = rosenbrock2d(a=1.0, b=100.0)
    sampler = NUTS(target, init(4, 2), target_accept_p=0.95).seed(42)
    n_collect, n_discard = 400, 400

    sample, stats = sampler.run_progress(n_collect, n_discard)
    print("sample shape:", sample.shape)
    print(stats)
    assert sample.shape == (4, 400, 2)


if __name__ == "__main__":
    main()
