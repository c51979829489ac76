"""In-kernel TPU hardware PRNG helpers shared by the fused Pallas kernels.

The fused step kernels (``hmc_full.py``, ``mh_full.py``) draw momenta,
proposals, and accept uniforms on-chip with the TPU hardware generator
(``pltpu.prng_random_bits``), seeded once per kernel invocation — the
replacement for the reference's per-chain ``SmallRng`` streams
(/root/reference/src/metropolis_hastings.rs:109, /root/reference/src/hmc.rs:309-313).
Results are distribution-identical to the framework's threefry stream but
not reproducible against it (documented at the ``use_pallas="full"`` opt-ins).

These helpers are only traceable INSIDE a Pallas TPU kernel; the hardware
primitives have no CPU interpreter lowering (as of jax 0.9), so CPU tests
cover the fused kernels' plumbing and TPU tests their statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:  # pragma: no cover - import guard mirrors ops/pallas/__init__
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_TWO_PI = 6.283185307179586


def key_to_seed(key):
    """Pack a threefry key into the two int32 words that seed the
    in-kernel hardware PRNG (the full 64 bits of key material — truncating
    to one word would alias step keys). Shared by every fused kernel
    call site so the seed schedule changes in one place. (Unlike the other
    helpers here, this traces anywhere — it runs OUTSIDE the kernel.)"""
    return jax.random.key_data(key).astype(jnp.int32).reshape(-1)[:2]


def bits_to_unit_open(bits):
    """uint32 -> float32 in (0, 1): 24 mantissa-ish bits, never 0.

    Mosaic has no uint32->float cast; the top-24-bit value fits int32.
    """
    i24 = (bits >> 8).astype(jnp.int32)
    return i24.astype(jnp.float32) * (1.0 / 16777216.0) + (1.0 / 33554432.0)


def random_bits(shape):
    """Raw hardware-PRNG bits as int32 (sign bit = fair coin)."""
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)


def uniform(shape):
    """float32 Uniform(0, 1) draws (open interval)."""
    return bits_to_unit_open(
        pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    )


def normals(shape):
    """Standard normals via Box-Muller from the hardware PRNG."""
    u1 = uniform(shape)
    u2 = uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def normals_paired(shape):
    """Standard normals using BOTH Box-Muller outputs (cos and sin of one
    angle) when the trailing dim is even: per pair of draws this costs one
    log/sqrt and two uniforms instead of two logs/sqrts and four — about
    half the transcendental work of :func:`normals`. Falls back to
    :func:`normals` for odd trailing dims. Used by the large-D separable
    HMC kernel (``hmc_bigd.py``), where momentum RNG is a measurable slice
    of the per-step VPU budget; the small-D kernels keep :func:`normals`
    so their established hardware-PRNG streams stay unchanged."""
    if shape[-1] % 2:
        return normals(shape)
    half = shape[:-1] + (shape[-1] // 2,)
    u1 = uniform(half)
    u2 = uniform(half)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = _TWO_PI * u2
    return jnp.concatenate([r * jnp.cos(ang), r * jnp.sin(ang)], axis=-1)
