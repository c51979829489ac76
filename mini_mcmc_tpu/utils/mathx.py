"""Elementwise math usable inside Pallas TPU kernels.

Mosaic (the Pallas TPU compiler) lowers only a core set of elementwise
primitives; ``lax.lgamma`` is not among them (as of jax 0.9). The discrete
targets' chains-on-lanes ``logp_dc`` forms — consumed by the fused Pallas
MH kernel (``ops/pallas/mh_full.py``) — therefore use this hand-rolled
Lanczos log-gamma built from supported ops (log/div/add only).

Accuracy: the g=7, n=9 Lanczos approximation is exact to double precision;
evaluated in float32 the error vs ``lax.lgamma`` is ~2e-4 absolute near the
zeros of lgamma (z=1, 2, where cancellation dominates) and a few fp32 ulps
relative elsewhere — far inside any statistical tolerance (tested in
``tests/test_utils.py``; measured pmf deviation on Poisson(4) MH: 2e-4).
The XLA sampler paths keep using ``lax.lgamma`` — this helper only feeds
the fused kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

# Lanczos g=7, n=9 coefficients (Godfrey's tabulation; public domain
# constants reproduced in Numerical Recipes and Boost.Math).
_LANCZOS_C0 = 0.99999999999980993
_LANCZOS_C = (
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)
_HALF_LOG_TWO_PI = 0.9189385332046727  # 0.5 * ln(2*pi)
_LANCZOS_G = 7.0


def lgamma_positive(z):
    """``ln Gamma(z)`` for ``z >= 0.5`` (no reflection branch).

    The discrete targets call this with ``z = k + 1 >= 1``; callers that
    need ``z < 0.5`` must apply the reflection formula themselves.
    """
    z = z - 1.0
    x = _LANCZOS_C0
    for i, c in enumerate(_LANCZOS_C):
        x = x + c / (z + (i + 1.0))
    t = z + _LANCZOS_G + 0.5
    return _HALF_LOG_TWO_PI + (z + 0.5) * jnp.log(t) - t + jnp.log(x)
