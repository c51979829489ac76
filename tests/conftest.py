"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip behavior is tested the way the reference tests thread
parallelism — with local parallel lanes: 8 virtual CPU devices via
``--xla_force_host_platform_device_count`` (SURVEY.md section 4). Must run
before the first jax import.
"""

import os

# Force CPU: the surrounding environment may pin JAX_PLATFORMS to a real
# accelerator; tests must run on the virtual multi-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's accelerator plugin may override jax_platforms during its
# registration hook; force CPU again post-import.
jax.config.update("jax_platforms", "cpu")

# Some golden-value tests (NUTS trajectories, stats formulas) need f64 to
# match the reference's f64 tests; default computations remain f32.
jax.config.update("jax_enable_x64", True)
