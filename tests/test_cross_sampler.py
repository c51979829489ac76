"""Cross-sampler agreement: MH, HMC, and NUTS sample the same correlated
Gaussian; their estimated means, covariances and tail quantiles must agree
with each other and with the analytic values. A bug in any one kernel's
accept rule, integrator, or tree bookkeeping shows up as a systematic
discrepancy here even when that sampler's own unit tests pass.
"""

import jax.numpy as jnp
import numpy as np
from scipy.stats import norm

from mini_mcmc_tpu import HMC, NUTS, MetropolisHastings, init_det
from mini_mcmc_tpu.models import (
    diffable_gaussian2d,
    gaussian2d,
    isotropic_gaussian_proposal,
)

MEAN = np.array([1.0, -2.0])
COV = np.array([[2.0, 0.8], [0.8, 1.5]])


def _flat(sample):
    return np.asarray(sample).reshape(-1, 2)


def _run_all():
    mh = MetropolisHastings(
        gaussian2d(MEAN, COV), isotropic_gaussian_proposal(1.5), init_det(8, 2)
    ).seed(1)
    hmc = HMC(diffable_gaussian2d(MEAN, COV), init_det(8, 2), 0.3, 15).seed(2)
    nuts = NUTS(diffable_gaussian2d(MEAN, COV), init_det(8, 2), 0.8).seed(3)
    return {
        "mh": _flat(mh.run(4000, 1000)),
        "hmc": _flat(hmc.run(2500, 500)),
        "nuts": _flat(nuts.run(1500, 500)),
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
