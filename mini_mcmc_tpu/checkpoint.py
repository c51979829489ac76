"""Checkpoint / resume for sampler state.

The reference flags this as an open TODO ("Somehow save state of the chains
and enable continuing runs", /root/reference/src/core.rs:134,
/root/reference/src/nuts.rs:524). Here the entire sampler state — positions,
cached log densities/gradients, adaptation state (NUTS dual averaging),
PRNG key, and streaming tracker moments — is a pytree, so checkpointing is
structural: leaves are serialized with orbax (``<path>.orbax`` directory,
the default when orbax is importable) or as a plain ``.npz`` (the
``backend="npz"`` fallback, no extra dependencies); the pytree structure is
pickled alongside either way. ``load_checkpoint`` auto-detects the format.

Checkpoints are mesh-portable: leaves are gathered to host at save time, so
a state saved from a run sharded over N devices restores onto any other
mesh size — re-shard the restored state with
``parallel.shard_sampler_state`` (or pass ``mesh=`` to
:func:`restore_sampler`).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:  # pragma: no cover - orbax is normally available
        return None


def _leaf_to_host(x):
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # Multi-process mesh: this process only holds its shards, and
        # np.asarray on a span-non-addressable array raises. Gather the
        # global value across processes first (a collective — every
        # process must execute it; only process 0 writes the result).
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def _tree_to_host(tree: Any):
    return jax.tree_util.tree_map(_leaf_to_host, tree)


def save_checkpoint(path: str, state: Any, key: jax.Array | None = None,
                    *, backend: str = "auto", extra: Any = None) -> None:
    """Save a sampler state pytree (and optionally the PRNG key) to ``path``.

    ``backend``: ``"auto"`` (orbax when importable, else npz), ``"orbax"``
    (require orbax), or ``"npz"``. Either way the pytree structure is
    written to ``<path>.tree``; leaves go to ``<path>.orbax/`` (an orbax
    checkpoint directory) or ``<path>.npz``. Works for any of the
    framework's state pytrees; sharded leaves are gathered to host first,
    so the checkpoint is independent of the saving run's mesh.

    ``extra``: optional side pytree stored alongside (``save_sampler`` uses
    it to record the sampler's metric so ``restore_sampler`` can reject a
    coordinate-system mismatch).
    """
    if backend not in ("auto", "orbax", "npz"):
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    ocp = _orbax() if backend in ("auto", "orbax") else None
    if backend == "orbax" and ocp is None:
        raise RuntimeError("backend='orbax' requested but orbax is not "
                           "importable")
    payload = {"state": state}
    if key is not None:
        payload["key"] = key
    if extra is not None:
        payload["extra"] = extra
    # The allgather inside _tree_to_host is a collective: ALL processes
    # must run it. So is the orbax save below (it opens and closes with
    # global process barriers — a lone process-0 call would hang forever
    # waiting for the others); orbax itself has the primary host write and
    # the rest only participate in the sync. Only the plain-file writes
    # (.tree, .npz, stale-artifact cleanup) are process-0-only — on a
    # shared filesystem (the normal multi-host checkpoint target)
    # concurrent identical writers would race and corrupt the archive.
    leaves, treedef = jax.tree_util.tree_flatten(_tree_to_host(payload))
    is_primary = jax.process_index() == 0
    if is_primary:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path + ".tree", "wb") as f:
            pickle.dump(treedef, f)
    # Remove the other format's artifact: load_checkpoint auto-detects by
    # looking for <path>.orbax first, so a leftover directory from an
    # earlier save would otherwise shadow a newer .npz (and vice versa the
    # stale .npz would be picked up if the .orbax dir were later removed).
    if ocp is not None:
        # flat zero-padded names keep restore order == flatten order
        named = {f"leaf_{i:05d}": leaf for i, leaf in enumerate(leaves)}
        ocp.PyTreeCheckpointer().save(
            os.path.abspath(path) + ".orbax", named, force=True
        )
        if is_primary and os.path.exists(path + ".npz"):
            os.remove(path + ".npz")
    elif is_primary:
        np.savez(path + ".npz", *leaves)
        orbax_dir = os.path.abspath(path) + ".orbax"
        if os.path.isdir(orbax_dir):
            import shutil

            shutil.rmtree(orbax_dir)


def _load_payload(path: str):
    with open(path + ".tree", "rb") as f:
        treedef = pickle.load(f)
    orbax_dir = os.path.abspath(path) + ".orbax"
    if os.path.isdir(orbax_dir):
        ocp = _orbax()
        if ocp is None:
            raise RuntimeError(f"checkpoint {path} is in orbax format but "
                               "orbax is not importable")
        named = ocp.PyTreeCheckpointer().restore(orbax_dir)
        leaves = [named[k] for k in sorted(named)]
    else:
        with np.load(path + ".npz") as data:
            leaves = [data[k] for k in data.files]
    payload = jax.tree_util.tree_unflatten(treedef, leaves)
    return jax.tree_util.tree_map(jnp.asarray, payload)


def load_checkpoint(path: str):
    """Load a checkpoint saved by :func:`save_checkpoint` (either backend;
    the on-disk format is auto-detected).

    Returns ``(state, key)`` where ``key`` is ``None`` if it was not saved.
    Arrays come back as device arrays (committed to the default device);
    re-shard with ``parallel.shard_sampler_state`` to place them on a mesh.
    """
    payload = _load_payload(path)
    return payload["state"], payload.get("key")


def _metric_record(sampler):
    """The sampler's metric as a comparable pytree (None when unmetriced).

    All leaves are arrays (strings don't round-trip through the array
    backends): ``dense`` is 0/1 for diag/dense."""
    metric = getattr(sampler, "metric", None)
    if metric is None:
        return None
    arr = metric.scale if metric.kind == "diag" else metric.chol
    return {"dense": jnp.asarray(metric.kind == "dense", jnp.int32),
            "arr": jnp.asarray(arr)}


def _bijector_probe_crc(bij, _cache={}):
    """crc32 of a bijector's NUMERIC behavior: ``forward``/``log_det``
    evaluated at fixed probe points on the CPU backend, quantized to 5
    significant digits (ulp-stable across libm versions), rendered to
    text. Names alone can't distinguish two different custom maps that
    both kept the default ``name="bijector"`` — the probe can."""
    # keyed on the (frozen, hashable) Bijector itself, not id(): keeps the
    # entry pinned so a recycled id can never alias a different bijector
    hit = _cache.get(bij)
    if hit is not None:
        return hit
    import zlib

    import numpy as np

    pts = jnp.asarray([-3.1, -1.2, -0.3, 0.0, 0.4, 1.1, 2.7], jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        vals = np.concatenate([
            np.asarray(bij.forward(pts), np.float64),
            np.asarray(bij.log_det(pts), np.float64),
        ])
    text = bij.name + "|" + ",".join(
        np.format_float_scientific(v, precision=5) for v in vals
    )
    crc = zlib.crc32(text.encode())
    _cache[bij] = crc
    return crc


def _transform_record(sampler):
    """Fingerprint of the sampler's coordinate transform (None when
    untransformed) — array leaves only, stable across processes (unlike
    ``hash(str)``): per-coordinate crc32 of the bijector NAME (``bij``,
    the original format, always compared) plus a crc32 of the bijector's
    numeric behavior on fixed probe points (``bijv``, compared when both
    records carry it — pre-probe checkpoints restore unchanged). The
    state is stored in UNCONSTRAINED coordinates, so restoring through a
    different transform would silently mis-map every position."""
    tf = getattr(sampler, "transform", None)
    if tf is None or getattr(tf, "is_identity", True):
        return None
    import zlib

    return {
        "bij": jnp.asarray(
            [zlib.crc32(b.name.encode()) for b in tf._table], jnp.uint32
        ),
        "bijv": jnp.asarray(
            [_bijector_probe_crc(b) for b in tf._table], jnp.uint32
        ),
    }


def save_sampler(path: str, sampler, *, backend: str = "auto") -> None:
    """Checkpoint a wrapper sampler (state pytree + PRNG key).

    For a metric-whitened sampler (``HMC``/``NUTS`` with ``metric=``) the
    state is stored in its internal whitened coordinates and the metric is
    recorded alongside, so :func:`restore_sampler` can reject restoring
    into a sampler with a different coordinate system; likewise a
    ``transform=`` fingerprint for constrained samplers (the state lives
    in unconstrained coordinates).
    """
    extra = {"metric": _metric_record(sampler),
             "transform": _transform_record(sampler)}
    if extra["metric"] is None and extra["transform"] is None:
        extra = None  # plain samplers keep the original compact format
    save_checkpoint(path, sampler.state, sampler._key, backend=backend,
                    extra=extra)


def restore_sampler(path: str, sampler, *, mesh=None):
    """Restore state + key into an existing wrapper sampler (constructed
    with the same configuration). Returns the sampler.

    ``mesh``: optional ``jax.sharding.Mesh`` — shard the restored state's
    chains axis over it (checkpoints are mesh-portable: the saving run's
    device count does not need to match).

    Raises ``ValueError`` when the checkpointed shapes don't match the
    sampler's (different n_chains/dim/algorithm), or when the checkpoint
    was saved under a different metric than the restoring sampler's (the
    state is stored in whitened coordinates — restoring it through a
    different whitening map would silently mis-scale every position)."""
    payload = _load_payload(path)
    state, key = payload["state"], payload.get("key")
    saved_extra = payload.get("extra")
    # format migration: the pre-transform format stored the metric record
    # (or None) directly; the current format is {"metric", "transform"}
    if isinstance(saved_extra, dict) and "metric" in saved_extra:
        saved_metric = saved_extra.get("metric")
        saved_tf = saved_extra.get("transform")
    else:
        saved_metric, saved_tf = saved_extra, None
    cur_tf = _transform_record(sampler)
    tf_mismatch = (saved_tf is None) != (cur_tf is None)
    if not tf_mismatch and saved_tf is not None:
        tf_mismatch = (
            saved_tf["bij"].shape != cur_tf["bij"].shape
            or not bool(jnp.array_equal(saved_tf["bij"], cur_tf["bij"]))
        )
        # numeric-probe fingerprint: catches two DIFFERENT custom maps
        # that share a name (both left the default name "bijector");
        # absent from pre-probe checkpoints, which restore on names alone
        if not tf_mismatch and "bijv" in saved_tf and "bijv" in cur_tf:
            tf_mismatch = not bool(
                jnp.array_equal(saved_tf["bijv"], cur_tf["bijv"])
            )
    if tf_mismatch:
        raise ValueError(
            "checkpoint coordinate transform does not match the "
            "sampler's: the state is stored in unconstrained "
            "coordinates, so restoring it through a different transform "
            "would silently mis-map every position. Construct the "
            "restoring sampler with the same transform= the checkpoint "
            "was saved under."
        )
    cur_metric = _metric_record(sampler)
    mismatch = (saved_metric is None) != (cur_metric is None)
    if not mismatch and saved_metric is not None:
        mismatch = (
            int(saved_metric["dense"]) != int(cur_metric["dense"])
            or saved_metric["arr"].shape != cur_metric["arr"].shape
            or not bool(
                jnp.allclose(saved_metric["arr"], cur_metric["arr"],
                             rtol=1e-6)
            )
        )
    if mismatch:
        def _kind(rec):
            if rec is None:
                return None
            return "dense" if int(rec["dense"]) else "diag"

        raise ValueError(
            "checkpoint metric does not match the sampler's "
            f"(saved: {_kind(saved_metric)!r}, sampler: "
            f"{_kind(cur_metric)!r}); construct the restoring sampler "
            "with the same metric= the checkpoint was saved under"
        )

    # Format migration: checkpoints written before NUTSState grew the
    # `leapfrogs` counter unflatten with that field's None default; fill
    # the missing leaf with the -1 'unknown history' sentinel instead of
    # failing the structural tree_map below with an opaque mismatch.
    if (hasattr(state, "_replace")
            and getattr(state, "leapfrogs", 0) is None
            and getattr(sampler.state, "leapfrogs", None) is not None):
        state = state._replace(
            leapfrogs=jnp.full_like(sampler.state.leapfrogs, -1)
        )

    def check_and_cast(ref, new):
        if getattr(ref, "shape", ()) != getattr(new, "shape", ()):
            raise ValueError(
                f"checkpoint shape {new.shape} does not match sampler "
                f"state shape {ref.shape}; was the sampler constructed "
                "with the same configuration?"
            )
        return jnp.asarray(new, ref.dtype)

    sampler.state = jax.tree_util.tree_map(check_and_cast, sampler.state, state)
    if mesh is not None:
        from .parallel import shard_sampler_state

        sampler.state = shard_sampler_state(mesh, sampler.state)
    if key is not None:
        sampler._key = key
    return sampler
