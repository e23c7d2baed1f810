"""Prioritized replay buffer (PER, arXiv 1511.05952) on device.

TPU-native counterpart of ``tianshou/data/buffer/prio.py:10``
(``PrioritizedReplayBuffer``) + the vectorized
``PrioritizedVectorReplayBuffer`` (``vecbuf.py:40``): priorities live in a
single HBM sum tree over the flattened ``[num_envs * capacity]`` slot space;
alpha-exponentiated priorities, inverse-CDF sampling, importance weights
``(p_j / p_min)^-beta`` (here normalized by the batch max as the reference's
``learn`` does) and TD-error write-back (``prio.py:79-88``) are all pure
jittable ops, so PER adds zero host synchronization to the update step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.ops.segtree import (
    segtree_init,
    segtree_sample,
    segtree_total,
    segtree_update,
)

__all__ = ["PrioritizedReplayBuffer", "PrioritizedReplayBufferState"]


@struct.dataclass
class PrioritizedReplayBufferState(ReplayBufferState):
    tree: jax.Array = None  # [2 * pow2(num_envs * capacity)] sum tree
    max_prio: jax.Array = None  # scalar, running max priority
    beta: jax.Array = None  # scalar, annealable IS exponent


class PrioritizedReplayBuffer(ReplayBuffer):
    """Uniform ring buffer + sum-tree priorities over flat slot ids."""

    def __init__(
        self,
        capacity: int,
        num_envs: int = 1,
        stack_num: int = 1,
        alpha: float = 0.6,
        beta: float = 0.4,
    ):
        super().__init__(capacity, num_envs, stack_num)
        self.alpha = alpha
        self.init_beta = beta

    # -- flat slot ids -----------------------------------------------------
    def _flat(self, env_idx: jax.Array, pos: jax.Array) -> jax.Array:
        return env_idx.astype(jnp.int32) * self.capacity + pos.astype(jnp.int32)

    # -- construction ------------------------------------------------------
    def init(self, example_transition: Batch | Any) -> PrioritizedReplayBufferState:
        base = super().init(example_transition)
        return PrioritizedReplayBufferState(
            storage=base.storage,
            cursor=base.cursor,
            size=base.size,
            tree=segtree_init(self.num_envs * self.capacity),
            max_prio=jnp.ones((), jnp.float32),
            beta=jnp.asarray(self.init_beta, jnp.float32),
        )

    # -- writing -----------------------------------------------------------
    def add(
        self, state: PrioritizedReplayBufferState, transition: Batch | Any
    ) -> PrioritizedReplayBufferState:
        """New transitions enter at max priority (reference ``prio.py:50``)."""
        flat_idx = self._flat(jnp.arange(self.num_envs), state.cursor)
        tree = segtree_update(
            state.tree,
            flat_idx,
            jnp.full((self.num_envs,), state.max_prio**self.alpha),
        )
        new = ReplayBuffer.add(self, state, transition)
        return new.replace(tree=tree)

    # -- sampling ----------------------------------------------------------
    def sample_with_weights(
        self, state: PrioritizedReplayBufferState, key: jax.Array, batch_size: int
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Proportional sampling + IS weights normalized by the batch max."""
        total = segtree_total(state.tree)
        u = jax.random.uniform(key, (batch_size,)) * total
        flat = segtree_sample(state.tree, u)
        flat = jnp.minimum(flat, self.num_envs * self.capacity - 1)
        env_idx = flat // self.capacity
        pos = flat % self.capacity
        p = state.tree[flat + state.tree.shape[0] // 2]
        w = (jnp.maximum(p, 1e-12)) ** (-state.beta)
        w = w / jnp.max(w)
        return env_idx.astype(jnp.int32), pos.astype(jnp.int32), w

    def update_priorities(
        self,
        state: PrioritizedReplayBufferState,
        env_idx: jax.Array,
        pos: jax.Array,
        td_abs: jax.Array,
        eps: float = 1e-6,
    ) -> PrioritizedReplayBufferState:
        prio = jnp.abs(td_abs) + eps
        tree = segtree_update(
            state.tree, self._flat(env_idx, pos), prio**self.alpha
        )
        return state.replace(
            tree=tree, max_prio=jnp.maximum(state.max_prio, prio.max())
        )

    def set_beta(
        self, state: PrioritizedReplayBufferState, beta: float | jax.Array
    ) -> PrioritizedReplayBufferState:
        """Anneal the IS exponent (reference ``prio.py:106``)."""
        return state.replace(beta=jnp.asarray(beta, jnp.float32))
