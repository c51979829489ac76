"""Examples double as smoke tests — the analog of each reference example's
``test_main`` (/root/reference/examples/*.rs)."""

import importlib.util
import os

import pytest

_EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run_example(name):
    path = os.path.join(_EXAMPLES_DIR, name + ".py")
    spec = importlib.util.spec_from_file_location(f"examples.{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


@pytest.mark.parametrize(
    "name",
    [
        "minimal_mh",
        "gauss_mh",
        "rosenbrock_mh",
        "poisson_mh",
        "minimal_hmc",
        "rosenbrock3d_hmc",
        "minimal_nuts",
        "mixture_gibbs",
        "logistic_regression_nuts",
        "metric_nuts",
        "eight_schools_nuts",
        "ensemble_walkers",
        "chees_trajectory_adaptation",
        "bimodal_tempering",
        "ais_log_z",
        "gp_robust_regression",
        "streaming_production_run",
        "sharded_chains",
        "sgld_minibatch_logreg",
        "sgld_data_parallel",
    ],
)
def test_example(name):
    _run_example(name)
