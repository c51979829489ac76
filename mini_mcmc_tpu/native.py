"""ctypes bindings for the native C++ diagnostics oracle.

Builds ``native/libmcmc_native.so`` on demand with ``make`` (g++) and
exposes the three entry points (see ``native/mcmc_native.cpp``). Used by
tests to cross-validate the XLA diagnostics against an independent
implementation — the counterpart of the reference's FFT-vs-bruteforce
cross-checks (/root/reference/src/stats.rs:777-808), extended to the whole
split-R-hat/ESS pipeline.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmcmc_native.so"))

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(
        ["make", "-s"], cwd=os.path.abspath(_NATIVE_DIR), check=True
    )


def load(rebuild: bool = False) -> ctypes.CDLL:
    """Load (building if necessary) the native library."""
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    # Always invoke make: it is mtime-aware (a no-op when the .so is
    # current) and rebuilds a STALE .so left by an older checkout —
    # otherwise binding a newly added symbol below would raise
    # AttributeError and silently disable all native functionality.
    _build()
    lib = ctypes.CDLL(_SO_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.mcmc_autocov_bf.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64, f32p]
    lib.mcmc_geyer_tau.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64, f32p]
    lib.mcmc_split_rhat_ess.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f32p, f32p,
    ]
    lib.mcmc_rank_normalized_diag.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        f32p, f32p, f32p, f32p,
    ]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.mcmc_save_csv_f64.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_char_p,
    ]
    lib.mcmc_save_csv_f64.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def _as_f32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float32))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def autocov_bf(data) -> np.ndarray:
    """Brute-force autocovariance of each column: ``[n, d] -> [n, d]``."""
    lib = load()
    data = _as_f32(data)
    n, d = data.shape
    out = np.empty((n, d), np.float32)
    lib.mcmc_autocov_bf(_ptr(data), n, d, _ptr(out))
    return out


def geyer_tau(rho) -> np.ndarray:
    """Geyer initial-monotone pairwise sum tau per column: ``[n, p] -> [p]``."""
    lib = load()
    rho = _as_f32(rho)
    n, p = rho.shape
    out = np.empty((p,), np.float32)
    lib.mcmc_geyer_tau(_ptr(rho), n, p, _ptr(out))
    return out


def split_rhat_ess(sample) -> Tuple[np.ndarray, np.ndarray]:
    """Full split-chain diagnostics: ``[c, n, p] -> (rhat [p], ess [p])``."""
    lib = load()
    sample = _as_f32(sample)
    c, n, p = sample.shape
    rhat = np.empty((p,), np.float32)
    ess = np.empty((p,), np.float32)
    lib.mcmc_split_rhat_ess(_ptr(sample), c, n, p, _ptr(rhat), _ptr(ess))
    return rhat, ess


def rank_normalized_diag(sample) -> Tuple[np.ndarray, np.ndarray,
                                          np.ndarray, np.ndarray]:
    """Independent rank-normalized diagnostics (Vehtari et al. 2021):
    ``[c, n, p] -> (rhat_bulk, rhat_folded, ess_bulk, ess_tail)``, each
    ``[p]`` — the C++ cross-check for
    :func:`mini_mcmc_tpu.rank_normalized_diagnostics`."""
    lib = load()
    sample = _as_f32(sample)
    c, n, p = sample.shape
    outs = [np.empty((p,), np.float32) for _ in range(4)]
    lib.mcmc_rank_normalized_diag(
        _ptr(sample), c, n, p, *[_ptr(o) for o in outs]
    )
    return tuple(outs)


def save_csv_cube(cube, path: str) -> None:
    """Fast CSV export of a ``[c, n, d]`` float cube (reference schema).

    Values are written with shortest-round-trip formatting
    (``std::to_chars``) — parsing the text recovers the exact double,
    the same guarantee as the Python writer's ``repr`` (exact TEXT may
    differ in exponent style). ~20x the pure-Python writer on
    multi-million-row cubes; ``io.csv_io.save_csv`` uses this
    automatically when the library is available.
    """
    lib = load()
    cube = np.ascontiguousarray(np.asarray(cube, dtype=np.float64))
    if cube.ndim != 3:
        raise ValueError(f"expected [c, n, d], got shape {cube.shape}")
    c, n, d = cube.shape
    rc = lib.mcmc_save_csv_f64(
        cube.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        c, n, d, path.encode(),
    )
    if rc != 0:
        raise OSError(f"native CSV writer failed (code {rc}) for {path}")
