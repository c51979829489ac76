"""Streaming chunked runs: bounded-memory production sampling.

The streamed Parquet file must equal the one-shot observation-major
export row-for-row (the chunks ARE the observation blocks), the streaming
tracker must cover the whole run, and alignment contracts must be hard
errors.
"""

import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from mini_mcmc_tpu import (
    MetropolisHastings,
    init_with_seed,
    stream_run,
)
from mini_mcmc_tpu.models import gaussian2d, isotropic_gaussian_proposal

pyarrow = pytest.importorskip("pyarrow")
import pyarrow.parquet as pq  # noqa: E402

from mini_mcmc_tpu.io.parquet_io import (  # noqa: E402
    ParquetStreamWriter,
    save_parquet_tensor,
)


def _mh(seed=3):
    target = gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]])
    return MetropolisHastings(
        target, isotropic_gaussian_proposal(1.5), init_with_seed(8, 2, seed=0)
    ).seed(seed)


def test_streamed_parquet_equals_one_shot_tensor_export():
    chunks = []

    def collect(chunk, start):
        chunks.append((start, np.asarray(chunk)))

    mh = _mh()
    with tempfile.TemporaryDirectory() as d:
        path = d + "/stream.parquet"
        with ParquetStreamWriter(path) as w:

            def both(chunk, start):
                w.append(chunk, start)
                collect(chunk, start)

            res = stream_run(mh, 256, 64, on_chunk=both, n_discard=32)
        streamed = pq.read_table(path)

        # one-shot export of the concatenated cube
        full = np.concatenate([c for _, c in chunks], axis=0)
        path2 = d + "/oneshot.parquet"
        save_parquet_tensor(full, path2)
        oneshot = pq.read_table(path2)

    assert [s for s, _ in chunks] == [0, 64, 128, 192]
    assert streamed.column_names == oneshot.column_names
    assert streamed.equals(oneshot)  # row-for-row, indices included
    assert res.n_collected == 256
    assert res.p_accept.shape == ()  # global EWMA (reference semantics)
    assert 0.0 < float(res.p_accept) < 1.0
    assert np.all(np.isfinite(np.asarray(res.rhat)))
    assert "streamed 256" in str(res)


def test_stream_continues_chains_and_moments():
    mh = _mh(seed=9)
    seen = []
    stream_run(mh, 2048, 256, on_chunk=lambda c, s: seen.append(np.asarray(c)),
               n_discard=512)
    flat = np.concatenate(seen, axis=0).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 1.0], atol=0.25)
    # chunks are contiguous chain trajectories: the first row of chunk
    # k+1 is ONE MH step from the last row of chunk k, so the chains
    # whose boundary proposal was rejected are bit-identical across the
    # boundary — a state reset between chunks would make that fraction 0
    frac_carried = np.mean(
        np.all(seen[1][0] == seen[0][-1], axis=-1)
    )
    assert frac_carried > 0.05, frac_carried
    assert frac_carried < 1.0  # and the accepted chains did move


def test_stream_determinism_same_seed():
    outs = []
    for _ in range(2):
        mh = _mh(seed=11)
        chunks = []
        stream_run(mh, 128, 32,
                   on_chunk=lambda c, s: chunks.append(np.asarray(c)))
        outs.append(np.concatenate(chunks, axis=0))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_stream_alignment_errors():
    mh = _mh()
    with pytest.raises(ValueError, match="multiple of chunk_size"):
        stream_run(mh, 100, 32)
    with pytest.raises(ValueError, match="chunk_size must be"):
        stream_run(mh, 64, 0)

    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    blocked = MetropolisHastings(
        target, isotropic_gaussian_proposal(1.0), init_with_seed(4, 2, seed=1),
        steps_per_call=8,
    ).seed(2)
    with pytest.raises(ValueError, match="block size"):
        stream_run(blocked, 64, 4)


def test_stream_chain_major_layout():
    mh = _mh()
    shapes = []
    stream_run(mh, 64, 32, on_chunk=lambda c, s: shapes.append(c.shape),
               time_major=False)
    assert shapes == [(8, 32, 2), (8, 32, 2)]


def test_stream_with_block_kernel():
    target = gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    mh = MetropolisHastings(
        target, isotropic_gaussian_proposal(1.0),
        init_with_seed(8, 2, seed=2), steps_per_call=8,
    ).seed(5)
    seen = []
    res = stream_run(mh, 128, 64,
                     on_chunk=lambda c, s: seen.append(np.asarray(c)),
                     n_discard=64)
    assert res.n_collected == 128
    flat = np.concatenate(seen, axis=0).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 0.0], atol=0.3)


def test_stream_nuts_adapts_and_samples():
    # NUTS needs its prepare pass (step-size search + dual-averaging
    # schedule) before streaming, and streams through the simple runner
    # (no duplicated boundary rows).
    from mini_mcmc_tpu import NUTS
    from mini_mcmc_tpu.models import diffable_gaussian2d

    nuts = NUTS(
        diffable_gaussian2d([0.0, 1.0], [[4.0, 2.0], [2.0, 3.0]]),
        init_with_seed(8, 2, seed=3),
    ).seed(4)
    seen = []
    res = stream_run(nuts, 512, 128,
                     on_chunk=lambda c, s: seen.append(np.asarray(c)),
                     n_discard=128)
    cat = np.concatenate(seen, axis=0)
    # no duplicated rows at chunk boundaries
    for k in range(1, len(seen)):
        assert not np.array_equal(seen[k][0], seen[k - 1][-1])
    flat = cat.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 1.0], atol=0.4)
    assert res.n_collected == 512
    assert float(jnp.min(nuts.step_size)) > 0.0  # adaptation ran


def test_parquet_writer_rejects_wrong_orientation():
    with tempfile.TemporaryDirectory() as d:
        w = ParquetStreamWriter(d + "/x.parquet", n_chains=8)
        with pytest.raises(ValueError, match="TIME-major"):
            w.append(np.zeros((8, 32, 2)), 0)  # chain-major [C, k, D]
        w.append(np.zeros((32, 8, 2)), 0)  # correct time-major
        # chain-count drift across chunks is also caught without the ctor
        w2 = ParquetStreamWriter(d + "/y.parquet")
        w2.append(np.zeros((16, 8, 2)), 0)
        with pytest.raises(ValueError, match="TIME-major"):
            w2.append(np.zeros((8, 16, 2)), 16)
        w.close(), w2.close()


def test_stream_nuts_divergence_accounting():
    from mini_mcmc_tpu import NUTS
    from mini_mcmc_tpu.models import diffable_gaussian2d

    nuts = NUTS(
        diffable_gaussian2d([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]]),
        init_with_seed(4, 2, seed=5),
    ).seed(6)
    stream_run(nuts, 64, 32, n_discard=32)
    # the stream counts as "the last run": the per-run delta is defined
    # (snapshot taken) and has the per-chain shape
    d = np.asarray(nuts.last_run_divergences)
    assert d.shape == (4,)
    assert np.all(d >= 0)
