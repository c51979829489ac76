"""Golden-trajectory regression tests for the framework's own PRNG streams.

The reference pins whole NUTS chains against recorded values for fixed
SmallRng seeds (/root/reference/src/nuts.rs:1138-1222). SmallRng streams are
not reproducible across frameworks by design (SURVEY.md section 7, hard part
c), so these pins were recorded from *this* framework's threefry streams
(CPU backend, f32 state) and guard against silent behavioral regressions in
every sampler kernel, the runners, and the key-splitting discipline.
"""

import numpy as np

from mini_mcmc_tpu import HMC, NUTS, GibbsSampler, MetropolisHastings, init_det
from mini_mcmc_tpu.models import (
    diffable_gaussian2d,
    gaussian2d,
    gaussian_mixture_conditional,
    isotropic_gaussian_proposal,
    rosenbrock_nd,
)

TOL = dict(rtol=1e-5, atol=1e-6)


def test_mh_golden():
    mh = MetropolisHastings(
        gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]]),
        isotropic_gaussian_proposal(1.0),
        init_det(2, 2),
    ).seed(42)
    got = np.asarray(mh.run(3, 2))
    want = np.array(
        [
            [
                [0.4871397316455841, 0.8835896253585815],
                [-0.42063847184181213, 0.6616289019584656],
                [-0.42063847184181213, 0.6616289019584656],
            ],
            [
                [0.3370063900947571, 0.413869708776474],
                [0.3370063900947571, 0.413869708776474],
                [0.3370063900947571, 0.413869708776474],
            ],
        ]
    )
    np.testing.assert_allclose(got, want, **TOL)


def test_hmc_golden():
    hmc = HMC(rosenbrock_nd(), init_det(2, 3), 0.03, 5).seed(42)
    got = np.asarray(hmc.run(2, 1))
    want = np.array(
        [
            [
                [-0.281203031539917, 0.3082822263240814, -0.04274323955178261],
                [-0.32195794582366943, -0.09923222661018372, 0.06593181192874908],
            ],
            [
                [0.16172003746032715, -0.012871655635535717, 0.10444840788841248],
                [0.025404803454875946, 0.06355753540992737, 0.03369716554880142],
            ],
        ]
    )
    np.testing.assert_allclose(got, want, **TOL)


def test_nuts_golden():
    nuts = NUTS(
        diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]]),
        init_det(2, 2),
        0.8,
    ).seed(42)
    got = np.asarray(nuts.run(3, 2))
    want = np.array(
        [
            [
                [-0.02830461598932743, 0.4671318531036377],
                [1.8143078088760376, -0.13134165108203888],
                [-1.661930799484253, 1.9630908966064453],
            ],
            [
                [0.2957029640674591, 0.15354591608047485],
                [0.6634995937347412, 1.011912226676941],
                [0.7967013120651245, 0.7749073505401611],
            ],
        ]
    )
    np.testing.assert_allclose(got, want, **TOL)


def test_gibbs_golden():
    g = GibbsSampler(
        gaussian_mixture_conditional(-2.0, 1.0, 3.0, 1.5, 0.5), init_det(2, 2)
    ).seed(42)
    got = np.asarray(g.run(2, 1))
    want = np.array(
        [
            [[-3.2347629070281982, 0.0], [-1.484555721282959, 0.0]],
            [[-2.8789219856262207, 0.0], [-3.230823040008545, 0.0]],
        ]
    )
    np.testing.assert_allclose(got, want, **TOL)
