"""Pallas TPU kernels for the hot compute paths."""

from .hmc import make_pallas_leapfrog, pallas_available

__all__ = ["make_pallas_leapfrog", "pallas_available"]
