"""Cross-sampler agreement: MH, HMC, MALA (via tuned()), NUTS, coordinate
slice and elliptical slice all sample the same correlated Gaussian; their estimated
means, covariances and tail quantiles must agree with each other and with
the analytic values. A bug in any one kernel's accept rule, integrator,
tree bookkeeping, or bracket construction shows up as a systematic
discrepancy here even when that sampler's own unit tests pass.
"""

import jax.numpy as jnp
import numpy as np
from scipy.stats import norm

from mini_mcmc_tpu import (
    HMC,
    MALA,
    NUTS,
    EllipticalSliceSampler,
    MetropolisHastings,
    SliceSampler,
    init_det,
)
from mini_mcmc_tpu.models import (
    diffable_gaussian2d,
    gaussian2d,
    isotropic_gaussian_proposal,
)
from mini_mcmc_tpu.models.base import Target

MEAN = np.array([1.0, -2.0])
COV = np.array([[2.0, 0.8], [0.8, 1.5]])


def _flat(sample):
    return np.asarray(sample).reshape(-1, 2)


def _run_all():
    mh = MetropolisHastings(
        gaussian2d(MEAN, COV), isotropic_gaussian_proposal(1.5), init_det(8, 2)
    ).seed(1)
    hmc = HMC(diffable_gaussian2d(MEAN, COV), init_det(8, 2), 0.3, 15).seed(2)
    # MALA at a dual-averaged step size (the tuned() workflow end-to-end)
    mala = MALA(diffable_gaussian2d(MEAN, COV), init_det(8, 2),
                step_size=2.0).seed(6).tuned(300)
    nuts = NUTS(diffable_gaussian2d(MEAN, COV), init_det(8, 2), 0.8).seed(3)
    sl = SliceSampler(gaussian2d(MEAN, COV), init_det(8, 2)).seed(4)
    # elliptical: the target IS the prior (flat likelihood), sampled
    # exactly through the ellipse construction
    ell = EllipticalSliceSampler(
        Target(logp=lambda x: jnp.zeros(())),
        init_det(8, 2),
        prior_mean=jnp.asarray(MEAN, jnp.float32),
        prior_scale=jnp.asarray(np.linalg.cholesky(COV), jnp.float32),
    ).seed(5)
    return {
        "mh": _flat(mh.run(4000, 1000)),
        "hmc": _flat(hmc.run(2500, 500)),
        "mala": _flat(mala.run(4000, 1000)),
        "nuts": _flat(nuts.run(1500, 500)),
        "slice": _flat(sl.run(2500, 500)),
        "elliptical": _flat(ell.run(2500, 500)),
    }


def test_cross_sampler_moments_and_quantiles():
    samples = _run_all()
    sd = np.sqrt(np.diag(COV))
    for name, flat in samples.items():
        np.testing.assert_allclose(
            flat.mean(axis=0), MEAN, atol=0.2, err_msg=f"{name} mean"
        )
        np.testing.assert_allclose(
            np.cov(flat.T), COV, atol=0.4, err_msg=f"{name} cov"
        )
        # marginal 5% / 95% quantiles vs analytic Gaussian
        for d in range(2):
            for q in (0.05, 0.95):
                got = np.quantile(flat[:, d], q)
                want = MEAN[d] + sd[d] * norm.ppf(q)
                assert abs(got - want) < 0.35, (name, d, q, got, want)

    # pairwise agreement between samplers (tighter than the analytic bound)
    means = {k: v.mean(axis=0) for k, v in samples.items()}
    for a in means:
        for b in means:
            np.testing.assert_allclose(
                means[a], means[b], atol=0.3, err_msg=f"{a} vs {b}"
            )
