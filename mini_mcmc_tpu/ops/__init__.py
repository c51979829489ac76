"""Step kernels: one pure ``(init_fn, step_fn)`` pair per algorithm."""

from .gibbs import GibbsState, gibbs_kernel
from .hmc import HMCState, hmc_kernel
from .mh import MHState, mh_kernel

__all__ = [
    "GibbsState",
    "HMCState",
    "MHState",
    "gibbs_kernel",
    "hmc_kernel",
    "mh_kernel",
]
