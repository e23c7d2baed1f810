"""HBM-resident ring replay buffer with on-device sampling.

TPU-native re-design of the reference's buffer family
(``tianshou/data/buffer/base.py:14`` ``ReplayBuffer``,
``manager.py:12`` ``ReplayBufferManager``, ``vecbuf.py:15``
``VectorReplayBuffer``): instead of a Python object mutating a numpy-backed
``Batch``, the buffer is a pure pytree ``ReplayBufferState`` with storage
shaped ``[num_envs, capacity, ...]`` living in device HBM, plus integer
cursors.  Every operation (add / uniform sample / n-step index chaining /
frame-stack gather) is a pure jittable function of that state, so the whole
collect->sample->update pipeline stays on device with zero host sync.

Design note — ``CachedReplayBuffer`` (reference ``buffer/cached.py:7``):
the reference needs episode-staging caches because its manager interleaves
many envs' episodes inside ONE flat ring.  Here every env owns its own
contiguous ring (``[num_envs, capacity]``), so episodes are stored
contiguously by construction and the cached-buffer machinery has no role;
``chronological`` provides the ordered view the reference's cached layout
exists to guarantee.

Index semantics mirror the reference exactly:
- per-env circular writes (``buffer/base.py:239-292``);
- episode-aware ``next``: saturates at episode end or at the newest element
  (``buffer/base.py:184-190``, numba chaining ``manager.py:271-323``);
- episode-aware ``prev``: saturates at episode start or the oldest element
  (``buffer/base.py:174-183``) — used for frame-stacking
  (``buffer/base.py:340-382``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.tree import tree_slice, tree_zeros_like_leading

__all__ = ["ReplayBuffer", "ReplayBufferState"]


@struct.dataclass
class ReplayBufferState:
    """Pure pytree state of a vectorized ring buffer.

    ``storage`` leaves are ``[num_envs, capacity, ...]``; ``cursor``/``size``
    are ``[num_envs]`` int32 (next write slot / number of valid entries).
    """

    storage: Batch
    cursor: jax.Array
    size: jax.Array

    @property
    def num_envs(self) -> int:
        return self.cursor.shape[0]

    @property
    def capacity(self) -> int:
        return jax.tree_util.tree_leaves(self.storage)[0].shape[1]


class ReplayBuffer:
    """Static configuration + pure ops over :class:`ReplayBufferState`.

    Required storage keys (matching the reference's reserved keys,
    ``buffer/base.py:33-43``): ``obs, act, rew, terminated, truncated,
    obs_next`` — plus anything else the user adds (``info``-style extras,
    per-step policy outputs).  ``done`` is derived, not stored.
    """

    def __init__(
        self,
        capacity: int,
        num_envs: int = 1,
        stack_num: int = 1,
        save_only_last_obs: bool = False,
        ignore_obs_next: bool = False,
        sample_avail: bool = False,
    ):
        """Memory options mirror the reference (``buffer/base.py:55-77``),
        the difference between a 1M-transition pixel buffer fitting in HBM
        or not:

        - ``save_only_last_obs``: the env emits frame-stacked observations
          ``[stack, ...]``; store only the newest frame per slot and
          reconstruct the stack at sample time from the ``prev`` chain
          (reference dedup at insert, ``base.py:267-272``).
        - ``ignore_obs_next``: do not store ``obs_next`` at all; sampling
          reconstructs it as the observation at ``next(pos)`` (reference
          ``base.py:401-405``; at episode ends, where ``next`` saturates,
          this repeats the current obs — harmless because terminal values
          are bootstrap-masked).
        - ``sample_avail``: with ``stack_num > 1``, only sample indices
          whose full frame stack lies within one episode (reference
          stack-validity masking, ``base.py:306-328``).
        """
        assert capacity > 0 and num_envs > 0 and stack_num >= 1
        self.capacity = capacity
        self.num_envs = num_envs
        self.stack_num = stack_num
        self.save_only_last_obs = save_only_last_obs
        self.ignore_obs_next = ignore_obs_next
        self.sample_avail = sample_avail

    # -- storage-layout transform (memory options) ---------------------------
    def _to_storage_layout(self, transition: Batch | Any, batched: bool) -> Any:
        """Apply the memory options to an incoming transition: keep only the
        newest frame of stacked observations and/or drop ``obs_next``.
        ``batched`` selects between ``[num_envs, ...]`` leaves (add path)
        and bare single-transition leaves (init example)."""
        if not (self.save_only_last_obs or self.ignore_obs_next):
            return transition
        tr = dict(transition.items()) if hasattr(transition, "items") else dict(transition)
        if self.save_only_last_obs:
            for k in ("obs", "obs_next"):
                if k in tr:
                    tr[k] = tr[k][:, -1] if batched else tr[k][-1]
        if self.ignore_obs_next:
            tr.pop("obs_next", None)
        return Batch(tr) if isinstance(transition, Batch) else tr

    # -- construction ------------------------------------------------------
    def init(self, example_transition: Batch | Any) -> ReplayBufferState:
        """Allocate zeroed storage from a single-step example pytree
        (leaves shaped like one env's transition, no leading batch dims;
        with ``save_only_last_obs`` the example obs carries its leading
        frame-stack axis, which is dropped in storage)."""
        example_transition = self._to_storage_layout(
            example_transition, batched=False
        )
        storage = tree_zeros_like_leading(
            example_transition, (self.num_envs, self.capacity)
        )
        return ReplayBufferState(
            storage=storage,
            cursor=jnp.zeros((self.num_envs,), jnp.int32),
            size=jnp.zeros((self.num_envs,), jnp.int32),
        )

    # -- writing -----------------------------------------------------------
    def add(self, state: ReplayBufferState, transition: Batch | Any) -> ReplayBufferState:
        """Write one transition per env (leaves ``[num_envs, ...]``)."""
        transition = self._to_storage_layout(transition, batched=True)
        env_ids = jnp.arange(self.num_envs)
        storage = jax.tree.map(
            lambda buf, val: buf.at[env_ids, state.cursor].set(val),
            state.storage,
            transition,
        )
        return state.replace(
            storage=storage,
            cursor=(state.cursor + 1) % self.capacity,
            size=jnp.minimum(state.size + 1, self.capacity),
        )

    def add_masked(
        self,
        state: ReplayBufferState,
        transition: Batch | Any,
        mask: jax.Array,
        in_storage_layout: bool = False,
    ) -> ReplayBufferState:
        """Write one transition for the envs where ``mask`` is True only
        (the async-collection path: not all envs produce a transition every
        tick, reference ``AsyncCollector`` ``collector.py:671-943``).
        ``in_storage_layout`` skips the memory-option transform for values
        already in storage layout (the ``merge`` path)."""
        if not in_storage_layout:
            transition = self._to_storage_layout(transition, batched=True)
        env_ids = jnp.arange(self.num_envs)
        mask = mask.astype(bool)

        def _write(buf, val):
            old = buf[env_ids, state.cursor]
            m = mask.reshape(mask.shape + (1,) * (jnp.ndim(val) - 1))
            return buf.at[env_ids, state.cursor].set(jnp.where(m, val, old))

        storage = jax.tree.map(_write, state.storage, transition)
        inc = mask.astype(jnp.int32)
        return state.replace(
            storage=storage,
            cursor=(state.cursor + inc) % self.capacity,
            size=jnp.minimum(state.size + inc, self.capacity),
        )

    def add_trajectory(self, state: ReplayBufferState, traj: Batch | Any) -> ReplayBufferState:
        """Write a whole ``[T, num_envs, ...]`` rollout via ``lax.scan``."""

        def _body(st, tr):
            return self.add(st, tr), None

        state, _ = jax.lax.scan(_body, state, traj)
        return state

    # -- ring-position arithmetic -----------------------------------------
    def _done(self, state: ReplayBufferState, env: jax.Array, pos: jax.Array) -> jax.Array:
        s = state.storage
        return (s["terminated"][env, pos] | s["truncated"][env, pos]).astype(bool)

    def next_pos(self, state: ReplayBufferState, env: jax.Array, pos: jax.Array) -> jax.Array:
        """Episode-aware successor slot (saturating), vectorized.

        Mirrors reference ``ReplayBuffer.next`` (``buffer/base.py:184-190``):
        stays put at episode ends and at the newest written element.
        """
        newest = (state.cursor[env] - 1) % self.capacity
        stop = self._done(state, env, pos) | (pos == newest)
        return jnp.where(stop, pos, (pos + 1) % self.capacity)

    def prev_pos(self, state: ReplayBufferState, env: jax.Array, pos: jax.Array) -> jax.Array:
        """Episode-aware predecessor slot (saturating), vectorized.

        Mirrors reference ``ReplayBuffer.prev`` (``buffer/base.py:174-183``):
        stays put at episode starts (previous transition done) and at the
        oldest element.
        """
        oldest = (state.cursor[env] - state.size[env]) % self.capacity
        prev = (pos - 1) % self.capacity
        stop = self._done(state, env, prev) | (pos == oldest)
        return jnp.where(stop, pos, prev)

    # -- sampling ----------------------------------------------------------
    def sample_indices(
        self, state: ReplayBufferState, key: jax.Array, batch_size: int
    ) -> tuple[jax.Array, jax.Array]:
        """Uniform indices over all valid entries across envs.

        Returns ``(env_idx, pos)`` each ``[batch_size]``.  Proportional
        cross-env sampling as in the reference manager
        (``buffer/manager.py:172-206``).  With ``sample_avail`` and
        ``stack_num > 1``, sampling is uniform over the slots whose full
        frame stack lies within one episode (reference stack-validity
        masking, ``buffer/base.py:306-328``) via inverse-CDF over the
        validity mask.
        """
        if self.sample_avail and self.stack_num > 1:
            mask = self._avail_mask(state).reshape(-1)  # [num_envs*capacity]
            cum = jnp.cumsum(mask.astype(jnp.int32))
            total = jnp.maximum(cum[-1], 1)
            u = jax.random.randint(key, (batch_size,), 0, total)
            flat = jnp.searchsorted(cum, u, side="right").astype(jnp.int32)
            flat = jnp.minimum(flat, self.num_envs * self.capacity - 1)
            return flat // self.capacity, flat % self.capacity
        sizes = state.size
        total = jnp.maximum(jnp.sum(sizes), 1)
        flat = jax.random.randint(key, (batch_size,), 0, total)
        bounds = jnp.cumsum(sizes)
        env_idx = jnp.searchsorted(bounds, flat, side="right").astype(jnp.int32)
        env_idx = jnp.minimum(env_idx, self.num_envs - 1)
        offset_in_env = flat - jnp.where(env_idx > 0, bounds[env_idx - 1], 0)
        # age-ordered offset -> ring position
        start = (state.cursor[env_idx] - sizes[env_idx]) % self.capacity
        pos = (start + offset_in_env) % self.capacity
        return env_idx, pos

    def _avail_mask(self, state: ReplayBufferState) -> jax.Array:
        """[num_envs, capacity] bool: slots holding a complete in-episode
        frame stack.  A slot qualifies when the ``prev`` chain makes
        ``stack_num - 1`` real (non-saturating) steps — saturation happens
        at episode starts and at the oldest element, exactly the cases the
        reference excludes."""
        env = jnp.broadcast_to(
            jnp.arange(self.num_envs)[:, None], (self.num_envs, self.capacity)
        ).reshape(-1)
        pos = jnp.broadcast_to(
            jnp.arange(self.capacity)[None, :], (self.num_envs, self.capacity)
        ).reshape(-1)
        steps = jnp.zeros_like(pos)
        cur = pos
        for _ in range(self.stack_num - 1):
            prv = self.prev_pos(state, env, cur)
            steps = steps + (prv != cur).astype(pos.dtype)
            cur = prv
        valid_slot = (
            jnp.arange(self.capacity)[None, :]
            < self._age_limit(state)[:, None]
        )
        full_stack = (steps == self.stack_num - 1).reshape(
            self.num_envs, self.capacity
        )
        return valid_slot & full_stack

    def _age_limit(self, state: ReplayBufferState) -> jax.Array:
        """Per-env count below which a raw ring slot holds valid data:
        when the ring is full every slot is valid; otherwise slots
        ``[0, size)`` are (writes start at 0)."""
        return jnp.where(
            state.size >= self.capacity, self.capacity, state.size
        )

    def get(
        self,
        state: ReplayBufferState,
        env_idx: jax.Array,
        pos: jax.Array,
        keys: tuple[str, ...] | None = None,
    ) -> Batch:
        """Gather transitions at ``(env_idx, pos)``; adds derived ``done``.

        Observation keys honor the memory options (reference ``get``,
        ``buffer/base.py:340-405``): with ``stack_num > 1``, ``obs`` /
        ``obs_next`` come back stacked ``[B, stack, ...]`` (oldest frame
        first); with ``ignore_obs_next``, ``obs_next`` is reconstructed as
        the obs (stack) ending at ``next(pos)``.
        """
        if keys is None:
            keys = tuple(state.storage.keys())
            if self.ignore_obs_next and "obs_next" not in keys:
                keys = keys + ("obs_next",)
        out = Batch()
        stacked = self.stack_num > 1
        for k in keys:
            if k == "obs" and stacked:
                out[k] = self.stacked_obs(state, env_idx, pos)
            elif k == "obs_next" and self.ignore_obs_next:
                nxt = self.next_pos(state, env_idx, pos)
                out[k] = (
                    self.stacked_obs(state, env_idx, nxt)
                    if stacked
                    else state.storage["obs"][env_idx, nxt]
                )
            elif k == "obs_next" and stacked:
                out[k] = self.stacked_obs(state, env_idx, pos, obs_key="obs_next")
            else:
                out[k] = tree_slice(state.storage[k], (env_idx, pos))
        if "terminated" in out and "truncated" in out:
            out["done"] = out["terminated"] | out["truncated"]
        return out

    def sample(
        self, state: ReplayBufferState, key: jax.Array, batch_size: int
    ) -> tuple[Batch, jax.Array, jax.Array]:
        env_idx, pos = self.sample_indices(state, key, batch_size)
        return self.get(state, env_idx, pos), env_idx, pos

    # -- prioritization hooks (overridden by PrioritizedReplayBuffer) ------
    def sample_with_weights(
        self, state: ReplayBufferState, key: jax.Array, batch_size: int
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Uniform sampling: importance weights are all ones.  The PER
        subclass returns proportional indices + IS weights, letting
        algorithms stay agnostic (the reference threads this through
        ``process_fn``/``post_process_fn``, ``policy/base.py:480-502``)."""
        env_idx, pos = self.sample_indices(state, key, batch_size)
        return env_idx, pos, jnp.ones((batch_size,), jnp.float32)

    def update_priorities(
        self,
        state: ReplayBufferState,
        env_idx: jax.Array,
        pos: jax.Array,
        td_abs: jax.Array,
    ) -> ReplayBufferState:
        """No-op for uniform replay; PER overrides with sum-tree write-back."""
        return state

    # -- n-step chains -----------------------------------------------------
    def nstep_chain(
        self,
        state: ReplayBufferState,
        env_idx: jax.Array,
        pos: jax.Array,
        n_step: int,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Walk ``next_pos`` ``n_step-1`` times from each sampled index.

        Returns ``(rew_chain [B, n], done_chain [B, n], terminal_pos [B])``
        matching the reference's chained-``next`` gathering
        (``policy/base.py:626-682``).  Feed into
        :func:`tianshou_tpu.ops.returns.nstep_return`.
        """
        s = state.storage
        done = (s["terminated"] | s["truncated"]).astype(jnp.int32)
        rews, dones = [], []
        cur = pos
        for _ in range(n_step):
            rews.append(s["rew"][env_idx, cur])
            dones.append(done[env_idx, cur])
            cur = self.next_pos(state, env_idx, cur)
        rew_chain = jnp.stack(rews, axis=1)
        done_chain = jnp.stack(dones, axis=1)
        return rew_chain, done_chain, cur

    # -- frame stacking ----------------------------------------------------
    def stacked_obs(
        self,
        state: ReplayBufferState,
        env_idx: jax.Array,
        pos: jax.Array,
        stack_num: int | None = None,
        obs_key: str = "obs",
    ) -> jax.Array:
        """Gather the last ``stack_num`` observations ending at ``pos``.

        Saturates at episode starts (repeating the first frame), mirroring
        reference ``ReplayBuffer.get`` (``buffer/base.py:340-382``).
        Output shape ``[B, stack_num, ...]`` (oldest frame first).
        """
        k = stack_num or self.stack_num
        positions = [pos]
        cur = pos
        for _ in range(k - 1):
            cur = self.prev_pos(state, env_idx, cur)
            positions.append(cur)
        positions.reverse()
        obs = state.storage[obs_key]
        frames = [obs[env_idx, p] for p in positions]
        return jnp.stack(frames, axis=1)

    # -- merging / construction from datasets -------------------------------
    def merge(
        self,
        state: ReplayBufferState,
        src: "ReplayBuffer",
        src_state: ReplayBufferState,
    ) -> ReplayBufferState:
        """Copy every valid entry of ``src_state`` (oldest-first, per env)
        into ``state`` — the reference's ``ReplayBuffer.update(buffer)``
        merge (``buffer/base.py:192-214``), as a pure jittable op.

        Requires matching ``num_envs`` and storage keys.  Entries are
        written through the normal ring cursor, so overflow evicts the
        oldest entries of ``state`` exactly like repeated ``add`` calls.
        """
        assert src.num_envs == self.num_envs, "merge requires equal num_envs"
        env_ids = jnp.arange(self.num_envs)
        start = (src_state.cursor - src_state.size) % src.capacity

        def _body(st, t):
            pos = (start + t) % src.capacity
            tr = tree_slice(src_state.storage, (env_ids, pos))
            mask = t < src_state.size
            return self.add_masked(st, tr, mask, in_storage_layout=True), None

        state, _ = jax.lax.scan(_body, state, jnp.arange(src.capacity))
        return state

    @classmethod
    def from_data(
        cls, data: Batch | Any, stack_num: int = 1
    ) -> tuple["ReplayBuffer", ReplayBufferState]:
        """Build a full buffer directly from a transition dataset.

        ``data`` leaves are ``[N, ...]`` (a flat trajectory dataset, e.g.
        loaded from HDF5/D4RL) — the reference's ``ReplayBuffer.from_data``
        (``buffer/base.py:123-153``).  Returns a single-env buffer of
        capacity ``N`` that is exactly full.
        """
        n = jax.tree_util.tree_leaves(data)[0].shape[0]
        buf = cls(capacity=n, num_envs=1, stack_num=stack_num)
        storage = jax.tree.map(lambda x: jnp.asarray(x)[None], data)
        state = ReplayBufferState(
            storage=storage,
            cursor=jnp.zeros((1,), jnp.int32),
            size=jnp.full((1,), n, jnp.int32),
        )
        return buf, state

    # -- bulk views --------------------------------------------------------
    def chronological(self, state: ReplayBufferState) -> Batch:
        """Full buffer in time order per env: leaves ``[capacity, num_envs, ...]``.

        Only meaningful when all envs hold ``capacity`` entries (the
        on-policy full-buffer consumption pattern, reference
        ``OnpolicyTrainer`` ``trainer/base.py:647-694``).
        """
        # age order: slot (cursor + t) % capacity is the t-th oldest when full
        t = jnp.arange(self.capacity)
        pos = (state.cursor[None, :] + t[:, None]) % self.capacity  # [T, N]
        env = jnp.broadcast_to(
            jnp.arange(self.num_envs)[None, :], pos.shape
        )
        out = tree_slice(state.storage, (env, pos))
        return out
