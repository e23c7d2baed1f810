"""Prioritized replay buffer (PER, arXiv 1511.05952) on device.

TPU-native counterpart of ``tianshou/data/buffer/prio.py:10``
(``PrioritizedReplayBuffer``) + the vectorized
``PrioritizedVectorReplayBuffer`` (``vecbuf.py:40``): priorities live in a
single HBM sum tree over the flattened ``[num_envs * capacity]`` slot space;
alpha-exponentiated priorities, inverse-CDF sampling, importance weights and
TD-error write-back (``prio.py:79-88``) are all pure jittable ops, so PER
adds zero host synchronization to the update step.

Weight semantics match the reference exactly (``prio.py:68-88,100-104``):
with ``weight_norm=True`` (the default) weights are
``(p_j / p_min)^-beta / max_batch(...)`` — in which the ``p_min`` constant
cancels, so we compute ``p^-beta / max_batch(p^-beta)`` directly; with
``weight_norm=False`` they are ``(p_j / p_min)^-beta`` against the
reference's *running* ``_min_prio`` (a monotone lower bound updated on every
TD write-back, never recomputed over live leaves — reference ``prio.py:88``).
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
    min_prio: jax.Array = None  # scalar, running min priority (lower bound)
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
        weight_norm: bool = True,
    ):
        super().__init__(capacity, num_envs, stack_num)
        self.alpha = alpha
        self.init_beta = beta
        self.weight_norm = weight_norm

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
            min_prio=jnp.ones((), jnp.float32),
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
        """Proportional sampling + IS weights (see module docstring for the
        exact reference weight semantics under both ``weight_norm`` modes)."""
        total = segtree_total(state.tree)
        u = jax.random.uniform(key, (batch_size,)) * total
        flat = segtree_sample(state.tree, u)
        flat = jnp.minimum(flat, self.num_envs * self.capacity - 1)
        env_idx = flat // self.capacity
        pos = flat % self.capacity
        p = state.tree[flat + state.tree.shape[0] // 2]
        if self.weight_norm:
            # (p/p_min)^-beta / max((p/p_min)^-beta) == p^-beta / max(p^-beta)
            w = (jnp.maximum(p, 1e-12)) ** (-state.beta)
            w = w / jnp.max(w)
        else:
            w = (jnp.maximum(p, 1e-12) / state.min_prio) ** (-state.beta)
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
        # running extrema over raw (pre-alpha) priorities, exactly as the
        # reference maintains them (prio.py:87-88).  Note the reference
        # quirk reproduced here: get_weight (prio.py:77) divides the
        # alpha-exponentiated leaf by this RAW running min.
        return state.replace(
            tree=tree,
            max_prio=jnp.maximum(state.max_prio, prio.max()),
            min_prio=jnp.minimum(state.min_prio, prio.min()),
        )

    def set_beta(
        self, state: PrioritizedReplayBufferState, beta: float | jax.Array
    ) -> PrioritizedReplayBufferState:
        """Anneal the IS exponent (reference ``prio.py:106``)."""
        return state.replace(beta=jnp.asarray(beta, jnp.float32))
