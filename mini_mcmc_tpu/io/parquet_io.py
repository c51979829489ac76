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
