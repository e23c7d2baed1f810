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

__all__ = ["make_mesh", "shard_leading_axis", "replicate"]


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_leading_axis(tree: Any, mesh: Mesh, axis_name: str = "dp") -> Any:
    """Place a pytree on the mesh, sharding leaves whose leading dim is
    divisible by the mesh size along axis 0, replicating the rest
    (cursors of size [N] shard; scalars and PRNG keys replicate)."""
    n = mesh.devices.size

    def _place(x):
        arr = jax.numpy.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] % n == 0 and arr.shape[0] > 0:
            spec = P(axis_name, *([None] * (arr.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree.map(_place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
