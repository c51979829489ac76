"""Parquet export.

Schema parity with /root/reference/src/io/parquet.rs:49-221: the array
variant is chain-major (``chain, observation, dim_*``); the tensor variant
is **observation-major** (input ``[n_obs, n_chains, n_dims]``, columns
``observation, chain, dim_*`` — io/parquet.rs:112-124 preserves that
reference quirk).
"""

from __future__ import annotations

import numpy as np

try:
    import pyarrow.parquet as pq

    _HAVE_PYARROW = True
except Exception:  # pragma: no cover
    _HAVE_PYARROW = False


def _require_pyarrow():
    if not _HAVE_PYARROW:
        raise RuntimeError("pyarrow is not available; Parquet export disabled")


def save_parquet(data, filename: str) -> None:
    """Save a chain-major ``[n_chains, n_obs, n_dims]`` cube to Parquet."""
    _require_pyarrow()
    arr = np.asarray(data)
    if arr.ndim != 3:
        raise ValueError(f"expected [chains, observations, dims], got {arr.shape}")
    from .arrow_io import _cube_to_table

    pq.write_table(_cube_to_table(arr), filename)


def save_parquet_tensor(tensor, filename: str) -> None:
    """Save an observation-major ``[n_obs, n_chains, n_dims]`` device array
    to Parquet with ``observation, chain, dim_*`` columns."""
    _require_pyarrow()
    arr = np.asarray(tensor)
    if arr.ndim != 3:
        raise ValueError(f"expected [observations, chains, dims], got {arr.shape}")
    from .arrow_io import _cube_to_table

    pq.write_table(
        _cube_to_table(arr, leading=("observation", "chain")), filename
    )


class ParquetStreamWriter:
    """Append-as-you-sample Parquet sink for streamed runs.

    Writes the observation-major tensor schema (``observation, chain,
    dim_*``) chunk by chunk: feeding time-major chunks in order produces
    a file row-for-row IDENTICAL to :func:`save_parquet_tensor` of the
    full concatenated cube — without the full cube ever existing. Use as
    the ``on_chunk`` consumer of :func:`mini_mcmc_tpu.stream_run`:

        with ParquetStreamWriter(path) as w:
            stream_run(sampler, 1_000_000, 10_000, on_chunk=w.append)

    Context-manager or explicit :meth:`close`; the file is finalized on
    close (a crashed stream leaves an unreadable file, like any Parquet
    writer).
    """

    def __init__(self, filename: str, n_chains: int | None = None):
        _require_pyarrow()
        self._filename = filename
        self._writer = None
        self._n_chains = n_chains

    def append(self, chunk, start_observation: int) -> None:
        """Append a TIME-MAJOR ``[k, n_chains, n_dims]`` chunk whose
        first row is global observation ``start_observation`` (pair with
        ``stream_run(..., time_major=True)``, the default — a chain-major
        chunk would silently transpose the observation/chain columns).
        The first chunk pins ``n_chains``; pass ``n_chains`` to the
        constructor to validate the very first chunk's orientation too."""
        from .arrow_io import _cube_to_table

        arr = np.asarray(chunk)
        if arr.ndim != 3:
            raise ValueError(
                f"expected [observations, chains, dims], got {arr.shape}"
            )
        if self._n_chains is None:
            self._n_chains = arr.shape[1]
        elif arr.shape[1] != self._n_chains:
            raise ValueError(
                f"chunk has {arr.shape[1]} chains on axis 1, expected "
                f"{self._n_chains} — chunks must be TIME-major [k, C, D] "
                "(stream_run's time_major=True, the default)"
            )
        table = _cube_to_table(arr, leading=("observation", "chain"),
                               major_offset=int(start_observation))
        if self._writer is None:
            self._writer = pq.ParquetWriter(self._filename, table.schema)
        self._writer.write_table(table)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None

    def __enter__(self) -> "ParquetStreamWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
