"""Checkpoint/resume tests — closes the reference's open TODO
(/root/reference/src/core.rs:134): a checkpointed run continues bit-exactly
where it left off."""

import os
import tempfile

import numpy as np

from mini_mcmc_tpu import HMC, NUTS, MetropolisHastings, init_det
from mini_mcmc_tpu.checkpoint import restore_sampler, save_sampler
from mini_mcmc_tpu.models import (
    diffable_gaussian2d,
    gaussian2d,
    isotropic_gaussian_proposal,
    rosenbrock_nd,
)


def _ckpt_path(tmpdir):
    return os.path.join(tmpdir, "ckpt")


def test_mh_checkpoint_resume_bitexact():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    proposal = isotropic_gaussian_proposal(1.0)
    with tempfile.TemporaryDirectory() as tmp:
        a = MetropolisHastings(target, proposal, init_det(3, 2)).seed(9)
        a.run(40, 0)
        save_sampler(_ckpt_path(tmp), a)
        cont_a = a.run(60, 0)

        b = MetropolisHastings(target, proposal, init_det(3, 2)).seed(1234)
        restore_sampler(_ckpt_path(tmp), b)
        cont_b = b.run(60, 0)
    np.testing.assert_array_equal(np.asarray(cont_a), np.asarray(cont_b))


def test_hmc_checkpoint_resume_bitexact():
    target = rosenbrock_nd()
    with tempfile.TemporaryDirectory() as tmp:
        a = HMC(target, init_det(2, 3), 0.03, 5).seed(2)
        a.run(20, 0)
        save_sampler(_ckpt_path(tmp), a)
        cont_a = a.run(20, 0)

        b = HMC(target, init_det(2, 3), 0.03, 5).seed(777)
        restore_sampler(_ckpt_path(tmp), b)
        cont_b = b.run(20, 0)
    np.testing.assert_array_equal(np.asarray(cont_a), np.asarray(cont_b))


def test_nuts_checkpoint_preserves_adaptation():
    # Dual-averaging state (epsilon, h_bar, m) survives the round-trip so a
    # resumed run continues identically.
    target = diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    with tempfile.TemporaryDirectory() as tmp:
        a = NUTS(target, init_det(2, 2), 0.8).seed(5)
        a.run(10, 10)
        save_sampler(_ckpt_path(tmp), a)
        cont_a = a.run(15, 0)

        b = NUTS(target, init_det(2, 2), 0.8).seed(31337)
        restore_sampler(_ckpt_path(tmp), b)
        cont_b = b.run(15, 0)
    np.testing.assert_array_equal(np.asarray(cont_a), np.asarray(cont_b))
