"""I/O exporter tests with schema round-trips (tempfile-based like the
reference, /root/reference/src/io/csv.rs:156, arrow.rs:129, parquet.rs:232)."""

import csv
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from mini_mcmc_tpu.io import (
    save_arrow,
    save_csv,
    save_csv_tensor,
    save_parquet,
    save_parquet_tensor,
)

pa = pytest.importorskip("pyarrow")
import pyarrow.ipc  # noqa: E402, F401
import pyarrow.parquet as pq  # noqa: E402


def _cube():
    return np.arange(2 * 3 * 2, dtype=np.float64).reshape(2, 3, 2)


def test_csv_roundtrip_schema():
    data = _cube()
    with tempfile.NamedTemporaryFile(suffix=".csv", mode="r") as f:
        save_csv(data, f.name)
        rows = list(csv.reader(open(f.name)))
    assert rows[0] == ["chain", "observation", "dim_0", "dim_1"]
    assert len(rows) == 1 + 2 * 3
    # row for chain 1, obs 2
    last = rows[-1]
    assert last[0] == "1" and last[1] == "2"
    np.testing.assert_allclose([float(last[2]), float(last[3])], data[1, 2])


def test_csv_integer_cube():
    data = np.arange(8, dtype=np.int32).reshape(1, 4, 2)
    with tempfile.NamedTemporaryFile(suffix=".csv", mode="r") as f:
        save_csv(data, f.name)
        rows = list(csv.reader(open(f.name)))
    assert rows[1][2] == "0" and rows[1][3] == "1"


def test_csv_tensor_device_array():
    data = jnp.asarray(_cube())
    with tempfile.NamedTemporaryFile(suffix=".csv", mode="r") as f:
        save_csv_tensor(data, f.name)
        rows = list(csv.reader(open(f.name)))
    assert len(rows) == 7


def test_arrow_roundtrip():
    data = _cube()
    with tempfile.NamedTemporaryFile(suffix=".arrow") as f:
        save_arrow(data, f.name)
        table = pa.ipc.open_file(f.name).read_all()
    assert table.column_names == ["chain", "observation", "dim_0", "dim_1"]
    assert table.schema.field("chain").type == pa.uint32()
    assert table.schema.field("dim_0").type == pa.float64()
    assert table.num_rows == 6
    np.testing.assert_allclose(
        table.column("dim_0").to_numpy(), data[:, :, 0].ravel()
    )


def test_arrow_empty_input():
    data = np.zeros((0, 0, 3))
    with tempfile.NamedTemporaryFile(suffix=".arrow") as f:
        save_arrow(data, f.name)
        table = pa.ipc.open_file(f.name).read_all()
    assert table.num_rows == 0
    assert table.column_names == ["chain", "observation", "dim_0", "dim_1", "dim_2"]


def test_parquet_chain_major():
    data = _cube()
    with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
        save_parquet(data, f.name)
        table = pq.read_table(f.name)
    assert table.column_names == ["chain", "observation", "dim_0", "dim_1"]
    chains = table.column("chain").to_numpy()
    np.testing.assert_array_equal(chains, [0, 0, 0, 1, 1, 1])


def test_parquet_tensor_observation_major():
    # [n_obs, n_chains, n_dims] with observation-major rows
    # (io/parquet.rs:112-124).
    data = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 2, 2))
    with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
        save_parquet_tensor(data, f.name)
        table = pq.read_table(f.name)
    assert table.column_names == ["observation", "chain", "dim_0", "dim_1"]
    obs = table.column("observation").to_numpy()
    np.testing.assert_array_equal(obs, [0, 0, 1, 1, 2, 2])
