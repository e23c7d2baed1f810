"""Device-mesh utilities: data-parallel sharding of the RL pipeline.

TPU-native replacement for the reference's parallelism surface (SURVEY.md
§2.4): where the reference distributes by process-per-env workers and
``torch.nn.DataParallel`` (``utils/net/common.py:391-413``), here the env
axis of every pipeline pytree (vectorized env states, collector carry,
replay-buffer storage) is sharded over a ``jax.sharding.Mesh`` and XLA
partitions the jitted collect/update program, inserting ICI collectives
(gradient ``psum`` emerges from batch-sharded loss gradients) automatically
— the "annotate shardings, let XLA insert collectives" recipe.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "make_mesh2",
    "shard_leading_axis",
    "shard_ensemble_axis",
    "replicate",
]


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh2(
    n_devices: int | None = None,
    second_size: int = 2,
    axis_names: tuple[str, str] = ("dp", "ep"),
) -> Mesh:
    """2-axis mesh ``(n/second_size, second_size)``: data parallelism on
    the first axis plus a second model axis — ensemble parallelism for
    critic ensembles (the natural "model-parallel" dimension of this
    domain, SURVEY.md §2.4 EnsembleLinear row), or tensor parallelism if a
    network's hidden axis is annotated over it."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % second_size == 0, (n, second_size)
    return Mesh(
        np.asarray(devices).reshape(n // second_size, second_size), axis_names
    )


def shard_leading_axis(tree: Any, mesh: Mesh, axis_name: str = "dp") -> Any:
    """Place a pytree on the mesh, sharding leaves whose leading dim is
    divisible by the ``axis_name`` mesh-axis size along axis 0,
    replicating the rest (cursors of size [N] shard; scalars and PRNG
    keys replicate)."""
    n = mesh.shape[axis_name]

    def _place(x):
        arr = jax.numpy.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] % n == 0 and arr.shape[0] > 0:
            spec = P(axis_name, *([None] * (arr.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree.map(_place, tree)


def shard_ensemble_axis(
    tree: Any, mesh: Mesh, ensemble_size: int, axis_name: str = "ep"
) -> Any:
    """Shard leaves whose LEADING dim equals ``ensemble_size`` over the
    ``axis_name`` mesh axis, replicating everything else — ensemble
    parallelism for ``CriticEnsemble``-style ``[K, ...]`` parameter and
    optimizer-state pytrees (each mesh slice holds its own critics; the
    min/mean over critics in the loss becomes the only cross-slice
    collective, inserted by XLA)."""
    size = mesh.shape[axis_name]
    assert ensemble_size % size == 0, (ensemble_size, size)

    def _place(x):
        arr = jax.numpy.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] == ensemble_size:
            spec = P(axis_name, *([None] * (arr.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree.map(_place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
