"""Direct statistical tests of the custom in-kernel RNG streams.

The fused NUTS kernels drive merge swaps with a hand-rolled counter-based
hash (``_hash_unit``, ops/pallas/nuts_subtree.py) instead of a library
PRNG — the classic silent-bias risk (the reference never takes it:
SmallRng throughout, /root/reference/src/nuts.rs:388). These tests pin the
stream's quality DIRECTLY, off-TPU (the hash is plain jnp ops), so a wrong
finalizer constant or a dropped mix round fails here instead of washing
out into the aggregate quality bands three layers up.

The hardware-PRNG Box-Muller normals (ops/pallas/rng.py) are TPU-only;
their moment/autocorrelation tests live in tests/test_tpu_parity.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

from mini_mcmc_tpu.ops.pallas.nuts_subtree import _hash_u24, _hash_unit

SEED0, SEED1 = np.int32(0x12345678), np.int32(-0x6789ABCD)
N = 1 << 20  # ~1e6 draws


def _stream(seed0=SEED0, seed1=SEED1, lane=7, n=N):
    events = jnp.arange(n, dtype=jnp.int32)
    lane_id = jnp.full((n,), lane, jnp.int32)
    u = _hash_unit(jnp.int32(seed0), jnp.int32(seed1), events, lane_id)
    return np.asarray(u, np.float64)


def _bits24(seed0=SEED0, seed1=SEED1, lane=3, n=N, events=None):
    # the exact 24-bit lattice stream (the integer stage of _hash_unit)
    if events is None:
        events = jnp.arange(n, dtype=jnp.int32)
    lane_id = jnp.full(events.shape, lane, jnp.int32)
    return np.asarray(
        _hash_u24(jnp.int32(seed0), jnp.int32(seed1), events, lane_id),
        np.int64,
    )


def test_hash_unit_range_and_lattice():
    n = 1 << 16
    u = _stream(n=n)
    assert u.min() > 0.0 and u.max() < 1.0  # open interval, never 0/1
    i = _bits24(lane=7, n=n)
    assert i.min() >= 0 and i.max() < (1 << 24)
    # the float stream is the lattice stream mapped into (0, 1) (within
    # the float32 rounding of the +2^-25 midpoint offset)
    np.testing.assert_allclose(u, i / 2.0**24 + 2.0**-25, rtol=0,
                               atol=2.0**-24)


def test_hash_u24_golden_pin():
    # Exact recorded values of the integer stream. The aggregate tests
    # below are weak discriminators for hash tweaks (even a weakened
    # finalizer can pass 1e6-draw statistics); this pin makes ANY change
    # to the constants, rounds, or seeding fold fail loudly — the analog
    # of the reference's recorded-trajectory tier (nuts.rs:1138-1222).
    events = jnp.asarray([0, 1, 2, 1000, 123456], jnp.int32)
    lanes = jnp.asarray([0, 1, 127, 4095, 65535], jnp.int32)
    got = np.asarray(
        _hash_u24(jnp.int32(0x12345678), jnp.int32(-0x6789ABCD),
                  events, lanes))
    np.testing.assert_array_equal(
        got, [11171618, 4056581, 9274401, 645939, 8053499])
    got2 = np.asarray(_hash_u24(jnp.int32(42), jnp.int32(7), events, lanes))
    np.testing.assert_array_equal(
        got2, [5549272, 16236797, 11739482, 4669229, 10552142])


def test_hash_unit_ks_uniformity():
    # KS against Uniform(0,1) over ~1e6 sequential events: statistic below
    # the alpha=1e-3 critical value ~1.95/sqrt(n)
    u = _stream()
    stat = sps.kstest(u, "uniform").statistic
    assert stat < 1.95 / np.sqrt(N), stat


def test_hash_unit_serial_correlation():
    # lag-1..4 autocorrelation of the event-indexed stream: |rho| must be
    # statistical noise (~1/sqrt(n)); 5 sigma bound
    u = _stream()
    c = u - u.mean()
    denom = float(c @ c)
    for lag in (1, 2, 3, 4):
        rho = float(c[:-lag] @ c[lag:]) / denom
        assert abs(rho) < 5.0 / np.sqrt(N), (lag, rho)


def test_hash_unit_cross_lane_independence():
    # the same event sequence on different chain lanes must decorrelate:
    # pairwise correlations across 8 lanes at ~1e5 draws, 5 sigma bound
    n = 1 << 17
    lanes = [_stream(lane=k, n=n) for k in range(8)]
    for a in range(8):
        for b in range(a + 1, 8):
            rho = float(np.corrcoef(lanes[a], lanes[b])[0, 1])
            assert abs(rho) < 5.0 / np.sqrt(n), (a, b, rho)


def test_hash_unit_bit_balance():
    # every output bit of the 24-bit lattice index is a fair coin over the
    # event counter; 5 sigma binomial bound. A dropped mix round leaves
    # counter structure in the low bits and fails this hard.
    i = _bits24()
    for bit in range(24):
        p = float(((i >> bit) & 1).mean())
        assert abs(p - 0.5) < 5.0 * 0.5 / np.sqrt(N), (bit, p)


def test_hash_unit_avalanche_on_event_bits():
    # flipping ONE event bit must flip ~half of the output bits (strict
    # avalanche). The murmur3 finalizer achieves ~12/24 +- noise; a single
    # surviving mix round or a wrong constant lands far outside the band.
    n = 1 << 14
    events = jnp.arange(n, dtype=jnp.int32)
    base = _bits24(events=events)
    for bit in (0, 1, 7, 13, 22, 30):
        flipped = _bits24(events=events ^ jnp.int32(1 << bit))
        ham = np.unpackbits(
            (base ^ flipped).astype(np.uint32).view(np.uint8)
        ).sum() / n
        assert 10.5 < ham < 13.5, (bit, ham)


def test_hash_unit_seed_sensitivity():
    # per-step streams (different 64-bit step keys) must decorrelate, for
    # BOTH key words — folding the key into one word was the documented
    # aliasing failure mode (nuts_subtree.py:52-60)
    n = 1 << 17
    base = _stream(n=n)
    w0 = _stream(seed0=SEED0 ^ 1, n=n)
    w1 = _stream(seed1=SEED1 ^ 1, n=n)
    for other in (w0, w1):
        rho = float(np.corrcoef(base, other)[0, 1])
        assert abs(rho) < 5.0 / np.sqrt(n), rho
    # and the draws themselves differ essentially everywhere
    assert (base == w0).mean() < 1e-4
    assert (base == w1).mean() < 1e-4


def test_hash_unit_lane_vs_event_grid_uniform():
    # 2-D chi-square on the (lane, event) grid the kernel actually uses:
    # 128 lanes x 4096 events binned 16x16 must be jointly uniform
    lanes = jnp.arange(128, dtype=jnp.int32)[:, None]
    events = jnp.arange(4096, dtype=jnp.int32)[None, :]
    u = np.asarray(
        _hash_unit(jnp.int32(SEED0), jnp.int32(SEED1),
                   jnp.broadcast_to(events, (128, 4096)),
                   jnp.broadcast_to(lanes, (128, 4096))), np.float64)
    counts, _ = np.histogram(u.ravel(), bins=256, range=(0.0, 1.0))
    chi2 = float(((counts - counts.mean()) ** 2 / counts.mean()).sum())
    # dof=255; alpha=1e-3 critical value ~= 330
    assert chi2 < 330.0, chi2


@pytest.mark.parametrize("lag", [1, 2, 3])
def test_hash_unit_pairs_fill_the_square(lag):
    # serial 2-D equidistribution: (u_t, u_{t+lag}) pairs must fill the
    # unit square (catches lattice structure a 1-D KS test cannot see)
    u = _stream(n=1 << 18)
    h, _, _ = np.histogram2d(u[:-lag], u[lag:], bins=16,
                             range=[[0, 1], [0, 1]])
    expected = h.sum() / 256.0
    chi2 = float(((h - expected) ** 2 / expected).sum())
    # dof=255; alpha=1e-3 critical value ~= 330
    assert chi2 < 330.0, chi2
