"""Doc examples are executable — the analog of rustdoc-tested examples in
the reference (e.g. /root/reference/src/metropolis_hastings.rs:135-149)."""

import doctest

import mini_mcmc_tpu.samplers
import mini_mcmc_tpu.stats


def test_sampler_docstring_examples():
    results = doctest.testmod(mini_mcmc_tpu.samplers, verbose=False)
    assert results.failed == 0, results


def test_stats_docstring_examples():
    results = doctest.testmod(mini_mcmc_tpu.stats, verbose=False)
    assert results.failed == 0, results
