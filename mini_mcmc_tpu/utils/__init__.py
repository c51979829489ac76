"""Utilities: initialization, timers, host-side helpers."""

from . import profiling
from .init import chain_keys, init, init_det, init_with_seed
from .timer import Timer

__all__ = [
    "Timer",
    "chain_keys",
    "init",
    "init_det",
    "init_with_seed",
    "profiling",
]
