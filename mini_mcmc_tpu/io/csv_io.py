"""CSV export of the ``[chain, observation, dim]`` sample cube.

Schema parity with the reference (/root/reference/src/io/csv.rs:47-147):
header ``chain,observation,dim_0,...``; one row per (chain, observation).

Float cubes route through the native C++ writer (``native/
mcmc_native.cpp``, ~20x the pure-Python row loop on multi-million-row
cubes — the IO layer the reference implements natively in Rust) when the
library builds; the pure-Python path is the fallback and the integer-cube
path. Both write values with shortest-round-trip formatting and LF line
endings, so parsing either file recovers identical doubles (the exact
float TEXT can differ in exponent style between the two writers).
"""

from __future__ import annotations

import csv

import numpy as np


def save_csv(data, filename: str, *, native: bool | str = "auto") -> None:
    """Save a ``[n_chains, n_obs, n_dims]`` array as CSV.

    Values are written with shortest round-trip formatting (the reference
    uses Rust ``Display``, io/csv.rs:63-66); integer cubes stay integers.

    Args:
        native: ``"auto"`` (default) uses the C++ fast path for float
            cubes when available; ``True`` requires it (raises if the
            native library cannot be built); ``False`` forces the
            pure-Python writer.
    """
    arr = np.asarray(data)
    if arr.ndim != 3:
        raise ValueError(f"expected [chains, observations, dims], got {arr.shape}")
    if native is True and arr.dtype.kind != "f":
        raise ValueError(
            "native=True requires a float cube (the C++ writer formats "
            f"doubles); got dtype {arr.dtype} — integer cubes always use "
            "the Python writer"
        )
    if native and arr.dtype.kind == "f":
        try:
            from ..native import save_csv_cube

            save_csv_cube(arr, filename)
            return
        except Exception:
            if native is not True:
                pass  # auto: fall back to the Python writer
            else:
                raise
    n_chains, n_obs, n_dims = arr.shape
    # LF line endings, matching the native writer byte-for-byte (csv's
    # default is CRLF, which would make the output depend on whether the
    # native library built).
    with open(filename, "w", newline="") as f:
        writer = csv.writer(f, lineterminator="\n")
        writer.writerow(
            ["chain", "observation"] + [f"dim_{i}" for i in range(n_dims)]
        )
        for c in range(n_chains):
            for o in range(n_obs):
                writer.writerow([c, o] + [v for v in arr[c, o].tolist()])


def save_csv_tensor(tensor, filename: str, *, native: bool | str = "auto") -> None:
    """Device-array variant (mirrors ``save_csv_tensor``,
    io/csv.rs:112-147); same schema."""
    save_csv(np.asarray(tensor), filename, native=native)
