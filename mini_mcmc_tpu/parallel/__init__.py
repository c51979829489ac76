"""Multi-chip chain sharding (mesh, shardings, collective diagnostics)."""

from . import multihost
from .mesh import (
    chain_mesh,
    chain_sharding,
    chain_state_mesh,
    data_mesh,
    replicated_sharding,
    shard_chains,
    shard_sampler_state,
)

__all__ = [
    "chain_mesh",
    "chain_state_mesh",
    "chain_sharding",
    "data_mesh",
    "replicated_sharding",
    "shard_chains",
    "shard_sampler_state",
]
