"""Initial-position helpers and per-chain PRNG key derivation.

Replaces ``init`` / ``init_det`` / ``init_with_seed``
(/root/reference/src/core.rs:394-435): standard-normal starting points with
the deterministic variant pinned to seed 42. The reference's per-chain
stateful ``SmallRng`` (with algorithm-specific seed offsets, see
``mh.rs:187-193`` / ``gibbs.rs:179-187`` / ``nuts.rs:347-353``) becomes
counter-based threefry: one base key, ``fold_in(key, chain)`` per chain.
Sequences are distribution-identical, not bitwise-identical, to the
reference; golden tests pin *our* keyed trajectories instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DETERMINISTIC_SEED = 42  # matches init_det (/root/reference/src/core.rs:404-409)


def init_with_seed(n_chains: int, dim: int, seed: int, dtype=jnp.float32):
    """``[n_chains, dim]`` standard-normal starting positions from ``seed``."""
    key = jax.random.PRNGKey(seed)
    return jax.random.normal(key, (n_chains, dim), dtype)


def init_det(n_chains: int, dim: int, dtype=jnp.float32):
    """Deterministic starting positions (seed 42)."""
    return init_with_seed(n_chains, dim, DETERMINISTIC_SEED, dtype)


def init(n_chains: int, dim: int, key=None, dtype=jnp.float32):
    """Starting positions; OS-entropy analog takes an explicit key."""
    if key is None:
        import secrets

        key = jax.random.PRNGKey(secrets.randbits(63))
    return jax.random.normal(key, (n_chains, dim), dtype)


def chain_keys(key: jax.Array, n_chains: int) -> jax.Array:
    """Independent per-chain keys: ``fold_in(key, chain_index)``."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(n_chains, dtype=jnp.uint32)
    )
