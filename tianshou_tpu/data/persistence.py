"""Buffer persistence: HDF5 save/load of replay-buffer state.

Counterpart of the reference's HDF5 (de)serialization
(``tianshou/data/utils/converter.py:80+``, ``ReplayBuffer.save_hdf5`` /
``load_hdf5`` ``buffer/base.py:110-153``): the whole
:class:`ReplayBufferState` pytree (storage leaves + cursors [+ PER tree])
round-trips through one HDF5 file, with nested pytree paths flattened to
``/``-joined dataset names.
"""

from __future__ import annotations

from typing import Any

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBufferState
from tianshou_tpu.data.prio import PrioritizedReplayBufferState

__all__ = ["save_buffer_hdf5", "load_buffer_hdf5", "save_pytree_hdf5", "load_pytree_hdf5"]


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        name = "/".join(
            getattr(p, "key", getattr(p, "name", str(getattr(p, "idx", p))))
            for p in path
        )
        out[prefix + name] = np.asarray(leaf)
    return out


def save_pytree_hdf5(path: str, tree: Any) -> None:
    """Generic nested-structure HDF5 save with pickle fallback.

    The analog of the reference's ``to_hdf5`` converter
    (``tianshou/data/utils/converter.py:80-130``): array leaves become
    datasets under ``/``-joined pytree paths; anything numpy cannot
    represent as a non-object array (lambdas, custom objects, ragged
    lists) is cloudpickled into a uint8 dataset tagged with a
    ``pickled`` attribute, so arbitrary ``info``-style payloads
    round-trip."""
    import cloudpickle

    with h5py.File(path, "w") as f:
        f.attrs["generic_pytree"] = True

        def emit(prefix: str, obj: Any) -> None:
            if isinstance(obj, Batch):
                obj = {k: v for k, v in obj.items()}
                f.require_group(prefix or "/").attrs["batch"] = True
            if isinstance(obj, dict):
                grp = f.require_group(prefix or "/")
                grp.attrs.setdefault("batch", False)
                for k, v in obj.items():
                    emit(f"{prefix}/{k}" if prefix else str(k), v)
                return
            try:
                arr = np.asarray(obj)
                if arr.dtype == object:
                    raise TypeError
                f.create_dataset(prefix, data=arr)
            except (TypeError, ValueError):
                payload = np.frombuffer(cloudpickle.dumps(obj), np.uint8)
                ds = f.create_dataset(prefix, data=payload)
                ds.attrs["pickled"] = True

        emit("", tree)


def load_pytree_hdf5(path: str) -> Any:
    """Inverse of :func:`save_pytree_hdf5`."""
    import pickle

    with h5py.File(path, "r") as f:

        def read(obj):
            if isinstance(obj, h5py.Dataset):
                if obj.attrs.get("pickled", False):
                    return pickle.loads(obj[...].tobytes())
                return np.asarray(obj[...])
            out = {k: read(obj[k]) for k in obj.keys()}
            return Batch(out) if obj.attrs.get("batch", False) else out

        return read(f["/"])


def save_buffer_hdf5(path: str, state: ReplayBufferState) -> None:
    with h5py.File(path, "w") as f:
        f.attrs["prioritized"] = isinstance(state, PrioritizedReplayBufferState)
        for name, arr in _flatten(state.storage, "storage/").items():
            f.create_dataset(name, data=arr, compression="gzip")
        f.create_dataset("cursor", data=np.asarray(state.cursor))
        f.create_dataset("size", data=np.asarray(state.size))
        if isinstance(state, PrioritizedReplayBufferState):
            f.create_dataset("tree", data=np.asarray(state.tree))
            f.create_dataset("max_prio", data=np.asarray(state.max_prio))
            f.create_dataset("beta", data=np.asarray(state.beta))


def _read_group(f, prefix: str) -> Batch:
    """Rebuild a nested Batch from flattened ``/``-joined dataset names."""
    out: dict = {}
    grp = f[prefix]

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            parts = name.split("/")
            d = out
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = jnp.asarray(obj[...])

    grp.visititems(visit)
    return Batch(out)


def load_buffer_hdf5(path: str) -> ReplayBufferState:
    with h5py.File(path, "r") as f:
        storage = _read_group(f, "storage")
        cursor = jnp.asarray(f["cursor"][...])
        size = jnp.asarray(f["size"][...])
        if f.attrs.get("prioritized", False):
            return PrioritizedReplayBufferState(
                storage=storage,
                cursor=cursor,
                size=size,
                tree=jnp.asarray(f["tree"][...]),
                max_prio=jnp.asarray(f["max_prio"][...]),
                beta=jnp.asarray(f["beta"][...]),
            )
        return ReplayBufferState(storage=storage, cursor=cursor, size=size)
