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

__all__ = [
    "save_buffer_hdf5",
    "load_buffer_hdf5",
    "save_pytree_hdf5",
    "load_pytree_hdf5",
    "buffer_from_d4rl",
    "normalize_obs_in_buffer",
    "load_reference_buffer_hdf5",
    "load_any_buffer",
]


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


def load_reference_buffer_hdf5(source) -> tuple:
    """(ReplayBuffer, ReplayBufferState) from an HDF5 file written by the
    REFERENCE library's ``ReplayBuffer.save_hdf5``.

    The reference persists the buffer object's ``__dict__``
    (``buffer/base.py:110-113`` via ``to_hdf5`` ``utils/converter.py:93+``):
    scalars (``maxsize``, ``_index``, ``_size``, ``stack_num``) as root
    attrs and the ring storage as a ``_meta`` Batch group with the
    reserved transition keys as datasets.  This loader makes migration
    from the reference ecosystem a one-call operation: the ring contents,
    cursor and fill level carry over into a single-env buffer state.
    """
    from tianshou_tpu.data.buffer import ReplayBuffer

    with h5py.File(str(source), "r") as f:
        assert "_meta" in f, "not a reference-layout buffer file (no _meta)"
        meta = f["_meta"]
        storage: dict = {}
        for k in ("obs", "act", "rew", "terminated", "truncated", "obs_next"):
            if k in meta and isinstance(meta[k], h5py.Dataset):
                storage[k] = jnp.asarray(np.asarray(meta[k])[None])
        assert "obs" in storage and "act" in storage, sorted(meta.keys())
        if "rew" in storage:
            storage["rew"] = storage["rew"].astype(jnp.float32)
        # terminated/truncated may be absent in very old files with only
        # `done`; map done -> terminated in that case
        if "terminated" not in storage and "done" in meta:
            storage["terminated"] = jnp.asarray(np.asarray(meta["done"])[None])
            storage["truncated"] = jnp.zeros_like(storage["terminated"])
        maxsize = int(f.attrs["maxsize"])
        index = int(f.attrs.get("_index", 0))
        size = int(f.attrs.get("_size", maxsize))
        # the reference stores its memory options as attrs of an
        # ``options`` group (converter.py: ints/bools become group attrs)
        opts = f["options"].attrs if "options" in f else f.attrs
        stack_num = int(opts.get("stack_num", f.attrs.get("stack_num", 1)))
        # reference Atari buffers are saved with ignore_obs_next=True (no
        # obs_next dataset at all) and save_only_last_obs=True (one frame
        # per slot); the rebuilt buffer must carry the same flags so
        # sampling reconstructs obs_next/stacks instead of KeyError-ing
        ignore_obs_next = "obs_next" not in storage
        save_only_last_obs = bool(
            opts.get("save_only_last_obs", False)
        ) or (stack_num > 1 and ignore_obs_next)
    buf = ReplayBuffer(
        capacity=maxsize,
        num_envs=1,
        stack_num=max(1, stack_num),
        save_only_last_obs=save_only_last_obs,
        ignore_obs_next=ignore_obs_next,
    )
    state = ReplayBufferState(
        storage=Batch(storage),
        cursor=jnp.asarray([index], jnp.int32),
        size=jnp.asarray([size], jnp.int32),
    )
    return buf, state


# -- D4RL-format ingestion ---------------------------------------------------
#: D4RL qlearning-dataset keys -> buffer reserved keys (reference
#: ``examples/offline/utils.py``: load_buffer_d4rl / load_buffer)
_D4RL_KEYS = {
    "observations": "obs",
    "actions": "act",
    "rewards": "rew",
    "next_observations": "obs_next",
}


def buffer_from_d4rl(source) -> tuple:
    """(ReplayBuffer, ReplayBufferState) from a D4RL qlearning dataset.

    ``source`` is either a path to an HDF5/npz file in the D4RL schema
    (``observations, actions, rewards, terminals, next_observations``
    [, ``timeouts``]) or an in-memory mapping with those keys — the
    counterpart of the reference's ``load_buffer_d4rl``/``load_buffer``
    (``examples/offline/utils.py``).  ``terminals`` maps to ``terminated``
    and ``timeouts`` (when present) to ``truncated``, preserving the
    termination/truncation split that bootstrap masking depends on.
    """
    from tianshou_tpu.data.buffer import ReplayBuffer

    close = None
    if isinstance(source, (str, bytes)):
        s = str(source)
        if s.endswith(".npz") or s.endswith(".npy"):
            source = np.load(s)
        else:
            source = h5py.File(s, "r")
            close = source
    try:
        missing = [k for k in (*_D4RL_KEYS, "terminals") if k not in source]
        assert not missing, f"not a D4RL qlearning dataset; missing {missing}"
        data = {ours: np.asarray(source[k]) for k, ours in _D4RL_KEYS.items()}
        terminals = np.asarray(source["terminals"]).astype(bool)
        data["terminated"] = terminals
        data["truncated"] = (
            np.asarray(source["timeouts"]).astype(bool)
            if "timeouts" in source
            else np.zeros_like(terminals)
        )
        data["rew"] = data["rew"].astype(np.float32)
    finally:
        if close is not None:
            close.close()
    return ReplayBuffer.from_data(Batch(data))


def load_any_buffer(path: str) -> tuple:
    """(ReplayBuffer, ReplayBufferState) from ANY supported dataset file:

    - this framework's :func:`save_buffer_hdf5` layout (``storage`` group),
    - the reference library's ``save_hdf5`` layout (``_meta`` group),
    - a D4RL qlearning dataset (``observations``/... keys, .h5 or .npz).

    The single entry point behind ``--dataset`` in the high-level/CLI tier
    so migration from either ecosystem is one flag.
    """
    from tianshou_tpu.data.buffer import ReplayBuffer

    s = str(path)
    if s.endswith(".npz") or s.endswith(".npy"):
        return buffer_from_d4rl(s)
    with h5py.File(s, "r") as f:
        keys = set(f.keys())
    if "storage" in keys:
        state = load_buffer_hdf5(s)
        buf = ReplayBuffer(capacity=state.capacity, num_envs=state.num_envs)
        return buf, state
    if "_meta" in keys:
        return load_reference_buffer_hdf5(s)
    if "observations" in keys:
        return buffer_from_d4rl(s)
    raise ValueError(
        f"{path}: unrecognized buffer layout (expected a 'storage' group, "
        f"a reference '_meta' group, or D4RL qlearning keys; found "
        f"{sorted(keys)[:8]})"
    )


def normalize_obs_in_buffer(state: ReplayBufferState, eps: float = 1e-8):
    """Standardize ``obs``/``obs_next`` over the whole dataset; returns
    ``(state, mean, std)`` so the env side can apply the same transform at
    evaluation time (reference ``normalize_all_obs_in_replay_buffer``,
    ``examples/offline/utils.py``)."""
    obs = np.asarray(state.storage["obs"], np.float32)
    mean = obs.reshape(-1, obs.shape[-1]).mean(0)
    std = np.sqrt(obs.reshape(-1, obs.shape[-1]).var(0) + eps)
    storage = Batch(state.storage)
    storage["obs"] = jnp.asarray((obs - mean) / std)
    storage["obs_next"] = jnp.asarray(
        (np.asarray(state.storage["obs_next"], np.float32) - mean) / std
    )
    return state.replace(storage=storage), mean, std
