"""Arrow IPC export.

Schema parity with /root/reference/src/io/arrow.rs:53-117: columns
``chain`` (uint32), ``observation`` (uint32), ``dim_*`` (float64); handles
empty input by writing an empty record batch with the full schema.
"""

from __future__ import annotations

import numpy as np

try:
    import pyarrow as pa
    import pyarrow.ipc  # noqa: F401 — registers pa.ipc

    _HAVE_PYARROW = True
except Exception:  # pragma: no cover - environment without pyarrow
    _HAVE_PYARROW = False


def _cube_to_table(arr: np.ndarray, leading=("chain", "observation"),
                   major_offset: int = 0):
    """``[n0, n1, n_dims]`` cube -> the reference export table: two uint32
    index columns named ``leading`` (major axis first) + float64 ``dim_*``
    columns. The single copy of the schema shared by the Arrow AND Parquet
    exporters (parity target: io/arrow.rs:53-117, io/parquet.rs:49-221).
    ``major_offset`` shifts the major index (streaming appends)."""
    n0, n1, n_dims = arr.shape
    major_idx = np.repeat(
        np.arange(major_offset, major_offset + n0, dtype=np.uint32), n1
    )
    minor_idx = np.tile(np.arange(n1, dtype=np.uint32), n0)
    flat = arr.reshape(n0 * n1, n_dims).astype(np.float64)
    fields = [
        pa.field(leading[0], pa.uint32(), nullable=False),
        pa.field(leading[1], pa.uint32(), nullable=False),
    ] + [pa.field(f"dim_{i}", pa.float64(), nullable=False) for i in range(n_dims)]
    schema = pa.schema(fields)
    arrays = [pa.array(major_idx), pa.array(minor_idx)] + [
        pa.array(flat[:, i]) for i in range(n_dims)
    ]
    return pa.Table.from_arrays(arrays, schema=schema)


def save_arrow(data, filename: str) -> None:
    """Save a ``[n_chains, n_obs, n_dims]`` cube as an Arrow IPC file."""
    if not _HAVE_PYARROW:
        raise RuntimeError("pyarrow is not available; Arrow export disabled")
    arr = np.asarray(data)
    if arr.ndim != 3:
        raise ValueError(f"expected [chains, observations, dims], got {arr.shape}")
    table = _cube_to_table(arr)
    with pa.OSFile(filename, "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)
