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


def test_csv_native_fast_path_value_identical():
    # The C++ writer (native/mcmc_native.cpp mcmc_save_csv_f64) must
    # produce the same schema and value-identical rows as the Python
    # writer: both use shortest-round-trip float formatting, so PARSED
    # values match exactly even where the text style could differ.
    import tempfile

    from mini_mcmc_tpu.io.csv_io import save_csv
    from mini_mcmc_tpu.native import available

    if not available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    cube = rng.standard_normal((4, 30, 3))
    # extreme magnitudes + signed zero exercise the formatter corners
    cube[0, 0] = [0.0, -0.0, 1e-300]
    cube[0, 1] = [1e300, -1.5e-8, 12345678.9]
    with tempfile.TemporaryDirectory() as d:
        save_csv(cube, d + "/n.csv", native=True)
        save_csv(cube, d + "/p.csv", native=False)
        na = open(d + "/n.csv").read().splitlines()
        pa = open(d + "/p.csv").read().splitlines()
        assert na[0] == pa[0] == "chain,observation,dim_0,dim_1,dim_2"
        assert len(na) == len(pa) == 4 * 30 + 1
        va = np.genfromtxt(d + "/n.csv", delimiter=",", skip_header=1)
        vb = np.genfromtxt(d + "/p.csv", delimiter=",", skip_header=1)
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(va[:, 2:], cube.reshape(-1, 3))


def test_csv_native_float32_matches_python_path():
    # float32 cubes: both writers expand to the exact double value of
    # each float32 (the Python path via .tolist(), the native path via
    # the float64 cast), so parsed outputs match bit-for-bit.
    import tempfile

    from mini_mcmc_tpu.io.csv_io import save_csv
    from mini_mcmc_tpu.native import available

    if not available():
        import pytest

        pytest.skip("native library unavailable")
    cube = np.random.default_rng(2).standard_normal((2, 10, 2)).astype(
        np.float32
    )
    with tempfile.TemporaryDirectory() as d:
        save_csv(cube, d + "/n.csv", native=True)
        save_csv(cube, d + "/p.csv", native=False)
        va = np.genfromtxt(d + "/n.csv", delimiter=",", skip_header=1)
        vb = np.genfromtxt(d + "/p.csv", delimiter=",", skip_header=1)
    np.testing.assert_array_equal(va, vb)


def test_csv_native_failure_raises_or_falls_back():
    from mini_mcmc_tpu.io.csv_io import save_csv
    from mini_mcmc_tpu.native import available

    if not available():
        import pytest

        pytest.skip("native library unavailable")
    cube = np.zeros((1, 2, 2))
    bad = "/nonexistent_dir_xyz/out.csv"
    import pytest

    with pytest.raises(OSError):
        save_csv(cube, bad, native=True)
    # auto mode: the Python writer fallback hits the same bad path and
    # raises its own (file) error — nothing silently succeeds
    with pytest.raises(OSError):
        save_csv(cube, bad, native="auto")


def test_csv_both_writers_use_lf_and_wide_cube_ok():
    import tempfile

    from mini_mcmc_tpu.io.csv_io import save_csv
    from mini_mcmc_tpu.native import available

    cube = np.random.default_rng(3).standard_normal((2, 3, 2))
    with tempfile.TemporaryDirectory() as d:
        save_csv(cube, d + "/p.csv", native=False)
        raw = open(d + "/p.csv", "rb").read()
        assert b"\r\n" not in raw  # LF only, byte-stable across writers
        if available():
            save_csv(cube, d + "/n.csv", native=True)
            raw_n = open(d + "/n.csv", "rb").read()
            assert b"\r\n" not in raw_n
            # a very wide row (one formatted row > the 1 MiB base buffer)
            # must not overflow the native writer's staging buffer
            wide = np.random.default_rng(4).standard_normal((1, 1, 50000))
            save_csv(wide, d + "/w.csv", native=True)
            vals = np.genfromtxt(d + "/w.csv", delimiter=",",
                                 skip_header=1)
            np.testing.assert_array_equal(vals[2:], wide[0, 0])


def test_csv_native_true_rejects_integer_cube():
    import pytest

    from mini_mcmc_tpu.io.csv_io import save_csv

    with pytest.raises(ValueError, match="float cube"):
        save_csv(np.zeros((1, 2, 2), np.int32), "/tmp/x.csv", native=True)
