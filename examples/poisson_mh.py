"""Discrete-state MH: Poisson(4) with a +-1 random-walk proposal and a text
histogram — and the 65k-sharded-chains configuration from BASELINE.json.

Analog of /root/reference/examples/poisson_mh.rs, scaled: integer states
(int32) at 65,536 chains sharded over all available devices.
"""

import jax.numpy as jnp
import numpy as np
from scipy.stats import poisson

from mini_mcmc_tpu import MetropolisHastings
from mini_mcmc_tpu.models import poisson_target, random_walk_int_proposal
from mini_mcmc_tpu.parallel import chain_mesh, shard_sampler_state

N_CHAINS = 65536
LAMBDA = 4.0


def main():
    target = poisson_target(LAMBDA)
    proposal = random_walk_int_proposal()
    init = jnp.zeros((N_CHAINS, 1), jnp.int32)
    mh = MetropolisHastings(target, proposal, init).seed(42)

    # Shard the chains axis over every available device (one on a single
    # chip; 8 on the virtual CPU mesh; N on a pod slice).
    mesh = chain_mesh()
    mh.state = shard_sampler_state(mesh, mh.state)

    sample = mh.run(200, 100)
    ks = np.asarray(sample).ravel()

    print(f"{N_CHAINS} chains x {sample.shape[1]} draws over "
          f"{len(mesh.devices.ravel())} device(s)")
    for k in range(11):
        freq = float(np.mean(ks == k))
        pmf = poisson.pmf(k, LAMBDA)
        bar = "#" * int(freq * 200)
        print(f"k={k:2d} freq={freq:.4f} pmf={pmf:.4f} {bar}")
        assert abs(freq - pmf) < 0.05


if __name__ == "__main__":
    main()
