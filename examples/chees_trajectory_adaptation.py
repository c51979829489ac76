"""ChEES-HMC: let the chains pick their own trajectory length.

Beyond the reference (its HMC trajectory length is fixed forever,
/root/reference/src/hmc.rs:87-109). On an ill-scaled Gaussian a
single-leapfrog trajectory decorrelates the widest coordinate at a crawl;
ChEES adaptation (Hoffman, Radul & Sountsov 2021) grows the integration
time from a cross-chain criterion until trajectories span the slowest
timescale — then sampling is near-iid. Compare the effective sample size
per gradient evaluation before and after.
"""

import jax.numpy as jnp
import numpy as np

from mini_mcmc_tpu import ChEESHMC, HMC, init_with_seed, run_stats
from mini_mcmc_tpu.models import diffable_gaussian2d


def main():
    # sigma = (1, 8): the slow coordinate needs ~8x longer trajectories.
    target = diffable_gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 64.0]])
    chains, draws = 256, 1000

    # Baseline: eps-tuned but SHORT fixed trajectories (the reference's
    # only mode, with our dual-averaged step size).
    short = HMC(target, init_with_seed(chains, 2, seed=0), step_size=0.5,
                n_leapfrog=2, seed=1).tuned(200)
    stats_short = run_stats(short.run(draws, 100))
    grads_short = draws * 2  # n_leapfrog gradient evals per draw

    # ChEES: jointly adapt (step size, trajectory length) in one scan.
    chees = ChEESHMC(target, init_with_seed(chains, 2, seed=0),
                     step_size=0.5, seed=1).warmed_up(300)
    trace = chees.warmup_trace
    print("adapted step size:   %.3f" % chees.step_size)
    print("adapted traj length: %.2f  (grew from %.2f; ~%.1f leapfrogs "
          "per draw on average)"
          % (chees.traj_len, 0.5,
             chees.traj_len / (2 * chees.step_size)))
    print("acceptance over warmup: %.2f -> %.2f"
          % (float(jnp.mean(trace["alpha"][:20])),
             float(jnp.mean(trace["alpha"][-20:]))))

    stats_chees = run_stats(chees.run(draws, 100))
    grads_chees = draws * max(
        1.0, chees.traj_len / (2 * chees.step_size))

    print("\nshort fixed trajectories:", stats_short)
    print("ChEES-adapted trajectories:", stats_chees)
    # The bottleneck is the WORST coordinate (the wide one): a big tuned
    # eps decorrelates the narrow coordinate almost for free, so mean ESS
    # flatters the short-trajectory baseline. Sampling is only as done as
    # its slowest margin.
    eff_short = stats_short.ess.min / grads_short
    eff_chees = stats_chees.ess.min / grads_chees
    print("\nbottleneck (min) ESS per gradient evaluation: "
          "%.1f -> %.1f (%.1fx)"
          % (eff_short, eff_chees, eff_chees / max(eff_short, 1e-9)))

    sample = chees.run(200)
    var = np.asarray(jnp.var(sample, axis=(0, 1)))
    print("posterior variances:", var, "(true: [1, 64])")


if __name__ == "__main__":
    main()
