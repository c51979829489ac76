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
    want = np.array([[[-1.263067603111267, 1.0463517904281616], [-1.263067603111267, 1.0463517904281616], [-0.06124138832092285, -0.7339062690734863]], [[0.7796245813369751, -0.5611918568611145], [-0.9635631442070007, -0.2759959101676941], [-0.9635631442070007, -0.2759959101676941]]])
    np.testing.assert_allclose(got, want, **TOL)


def test_hmc_golden():
    hmc = HMC(rosenbrock_nd(), init_det(2, 3), 0.03, 5).seed(42)
    got = np.asarray(hmc.run(2, 1))
    want = np.array([[[-0.14505350589752197, 0.1920805126428604, 0.14582805335521698], [-0.40173739194869995, 0.0825369581580162, -0.11045617610216141]], [[-0.010563505813479424, 0.03497219830751419, 0.10533169656991959], [0.055189404636621475, 0.001628638245165348, -0.19908274710178375]]])
    np.testing.assert_allclose(got, want, **TOL)


def test_nuts_golden():
    nuts = NUTS(
        diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]]),
        init_det(2, 2),
        0.8,
    ).seed(42)
    got = np.asarray(nuts.run(3, 2))
    want = np.array([[[-0.02830461598932743, 0.4671318531036377], [-0.476519912481308, -0.24211065471172333], [1.7529797554016113, 1.296678066253662]], [[0.2957029640674591, 0.15354591608047485], [0.30506056547164917, 0.20337410271167755], [0.30506056547164917, 0.20337410271167755]]])
    np.testing.assert_allclose(got, want, **TOL)


def test_gibbs_golden():
    g = GibbsSampler(
        gaussian_mixture_conditional(-2.0, 1.0, 3.0, 1.5, 0.5), init_det(2, 2)
    ).seed(42)
    got = np.asarray(g.run(2, 1))
    want = np.array([[[-3.2347629070281982, 0.0], [-2.8789219856262207, 0.0]], [[-1.420780062675476, 0.0], [-0.2402639389038086, 1.0]]])
    np.testing.assert_allclose(got, want, **TOL)


def test_slice_golden():
    from mini_mcmc_tpu import SliceSampler

    ss = SliceSampler(
        gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]]), init_det(2, 2)
    ).seed(42)
    got = np.asarray(ss.run(3, 2))
    # recorded under the suite environment (x64 enabled: gaussian2d's
    # constants promote the slice-height comparison to f64, which is part
    # of the pinned behavior)
    want = np.array([[[0.47531795501708984, -0.5002284049987793], [1.5510098934173584, -0.3776308298110962], [0.2821296453475952, -0.6769263744354248]], [[-0.3397722542285919, -0.07031664252281189], [-0.24810613691806793, 0.5296776294708252], [-1.9839239120483398, -0.21355533599853516]]])
    np.testing.assert_allclose(got, want, **TOL)


def test_elliptical_golden():
    import jax.numpy as jnp

    from mini_mcmc_tpu import EllipticalSliceSampler
    from mini_mcmc_tpu.models import Target

    lik = Target(logp=lambda x: -0.5 * jnp.sum((x - 1.0) ** 2))
    es = EllipticalSliceSampler(lik, init_det(2, 2), prior_scale=2.0).seed(42)
    got = np.asarray(es.run(3, 2))
    want = np.array([[[1.0734288692474365, -0.7239532470703125], [-0.6502382159233093, 2.2215375900268555], [-0.5258798003196716, 2.0356640815734863]], [[0.08533897995948792, 1.828615665435791], [1.5698307752609253, 1.4083133935928345], [0.3501565754413605, 0.9250963926315308]]])
    np.testing.assert_allclose(got, want, **TOL)
