"""CSV export of the ``[chain, observation, dim]`` sample cube.

Schema parity with the reference (/root/reference/src/io/csv.rs:47-147):
header ``chain,observation,dim_0,...``; one row per (chain, observation).
"""

from __future__ import annotations

import csv

import numpy as np


def save_csv(data, filename: str) -> None:
    """Save a ``[n_chains, n_obs, n_dims]`` array as CSV.

    Values are written with Python's default formatting (the reference uses
    Rust ``Display``, io/csv.rs:63-66); integer cubes stay integers.
    """
    arr = np.asarray(data)
    if arr.ndim != 3:
        raise ValueError(f"expected [chains, observations, dims], got {arr.shape}")
    n_chains, n_obs, n_dims = arr.shape
    with open(filename, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(
            ["chain", "observation"] + [f"dim_{i}" for i in range(n_dims)]
        )
        for c in range(n_chains):
            for o in range(n_obs):
                writer.writerow([c, o] + [v for v in arr[c, o].tolist()])


def save_csv_tensor(tensor, filename: str) -> None:
    """Device-array variant (mirrors ``save_csv_tensor``,
    io/csv.rs:112-147); same schema."""
    save_csv(np.asarray(tensor), filename)
