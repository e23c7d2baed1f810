"""Packed host<->device pytree transfers.

Over a tunneled accelerator every individual array transfer costs a full
round trip (~25 ms measured on this image's TPU tunnel), so moving a
pytree leaf-by-leaf is latency-bound: 60 leaves = 1.5 s regardless of
size.  These helpers flatten a fixed-schema pytree into ONE contiguous
``float32`` buffer so any host<->device hand-off costs exactly one RTT
plus bandwidth.  This is the transport role the reference fills with
shared-memory pipes between env workers and the learner process
(``tianshou/env/worker/subproc.py:34-76``) — here the boundary is the
host<->accelerator link instead of process memory.

Exactness: float32/bool/small-int leaves round-trip exactly (bools and
int32 values < 2**24 are exactly representable in float32); callers with
float64 or large-int leaves should not use the packed path.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TreePacker"]


class TreePacker:
    """Pack/unpack a fixed-schema pytree through one flat float32 buffer.

    ``pack`` runs on the host (numpy); ``unpack`` is traceable, so it can
    run inside the consuming jitted program — the flat buffer is then the
    ONLY array crossing the host->device boundary.
    """

    def __init__(self, example: Any):
        leaves, self.treedef = jax.tree.flatten(example)
        self.shapes = [np.shape(l) for l in leaves]
        # canonicalized (x64-off) dtypes: float64 host leaves (e.g. MuJoCo
        # observations) land as float32, same as a direct device_put would
        self.dtypes = [
            jax.dtypes.canonicalize_dtype(np.asarray(l).dtype) for l in leaves
        ]
        self.sizes = [int(math.prod(s)) for s in self.shapes]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        self.total = int(self.offsets[-1])

    def pack(self, tree: Any) -> np.ndarray:
        leaves = jax.tree.leaves(tree)
        out = np.empty((self.total,), np.float32)
        for leaf, off, size in zip(leaves, self.offsets, self.sizes):
            out[off : off + size] = np.asarray(leaf, np.float32).ravel()
        return out

    def unpack(self, flat: jax.Array) -> Any:
        leaves = [
            jax.lax.dynamic_slice_in_dim(flat, int(off), size)
            .reshape(shape)
            .astype(dtype)
            for off, size, shape, dtype in zip(
                self.offsets, self.sizes, self.shapes, self.dtypes
            )
        ]
        return jax.tree.unflatten(self.treedef, leaves)
