"""Large-D HMC on the separable fused tier, with constraints.

Beyond the reference (its largest HMC config is 6 chains at d=10,000,
/root/reference/src/hmc.rs:882-916, on the generic small-D path): for
coordinate-separable targets — ``logp(x) = sum_d f_d(x_d)`` — the
``use_pallas="separable"`` tier runs the WHOLE leapfrog trajectory per
VMEM tile (momentum drawn in-kernel, gradient re-derived per tile, no
``[C, D]`` gradient cache), so per-step HBM traffic is independent of the
trajectory length. Per-coordinate ``transform=`` bijectors and DIAGONAL
``metric=`` whitening compose with it through coordinate tables
(``Target.sep_form``), making constrained + preconditioned large-D
sampling a one-line opt-in. On CPU (no hardware PRNG) the same model
runs the XLA leapfrog — the algorithm and its quality gates are
identical; only the integrator implementation differs.
"""

import math

import jax
import jax.numpy as jnp

from mini_mcmc_tpu import HMC, init_with_seed
from mini_mcmc_tpu.models import standard_normal
from mini_mcmc_tpu.models.transforms import CoordinateTransform, positive


def main():
    on_tpu = jax.default_backend() == "tpu"
    # TPU-shaped on hardware; small enough to smoke-run on CPU in tests
    c, d, n = (1024, 10_000, 64) if on_tpu else (64, 128, 64)
    kw = {"use_pallas": "separable"} if on_tpu else {}

    # 1) plain separable target at scale
    h = HMC(standard_normal(), init_with_seed(c, d, seed=0), 0.1, 10,
            **kw).seed(0)
    s = h.run(n, n)
    print(f"[{'separable fused' if on_tpu else 'XLA'}] {c} chains x "
          f"d={d}: mean {float(jnp.mean(s)):+.4f} "
          f"var {float(jnp.var(s)):.4f} (expect 0, 1)")

    # 2) constrained: N(0,1) on natural coordinates restricted positive
    #    (the half-normal — exact moments sqrt(2/pi), 1 - 2/pi); the
    #    positivity bijector's group mask tiles through the same kernel
    tf = CoordinateTransform({i: positive() for i in range(d)}, d)
    h = HMC(standard_normal(), jnp.full((c, d), 1.0, jnp.float32),
            0.22, 8, transform=tf, **kw).seed(1)
    s = h.run(n, n)  # samples come back in natural (positive) coordinates
    print(f"[constrained]     mean {float(jnp.mean(s)):+.4f} "
          f"(exact {math.sqrt(2 / math.pi):.4f}) "
          f"var {float(jnp.var(s)):.4f} "
          f"(exact {1 - 2 / math.pi:.4f}) min {float(jnp.min(s)):.2e}")


if __name__ == "__main__":
    main()
