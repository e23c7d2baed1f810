"""Algorithm base: pure-functional policy/learning interface.

TPU-native re-design of the reference's ``BasePolicy``
(``tianshou/policy/base.py:134``): instead of a stateful ``nn.Module`` with
``forward``/``process_fn``/``learn``/``post_process_fn`` mutating Python
state, an :class:`Algorithm` is a *static* configuration object whose methods
are pure functions over an explicit :class:`TrainState` pytree.  Every method
is jittable (the algorithm object is closed over as a static constant), so
act/update fuse into the collector scan and the trainer super-step.

Mapping to the reference contract:
- ``forward``          -> :meth:`act` (explicit PRNG key, explore flag)
- ``process_fn+learn`` -> :meth:`update` (sample, target computation and SGD
                          fused in one jitted function)
- ``post_process_fn``  -> return value of :meth:`update` (e.g. new PER
                          priorities), applied functionally by the caller
- ``map_action``       -> :meth:`map_action` (``policy/base.py:365-426``)
- ``soft_update``      -> :func:`polyak_update` (``policy/base.py:285-288``)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.envs.spaces import Box, Discrete, MultiDiscrete, Space

__all__ = ["TrainState", "Algorithm", "polyak_update", "RandomPolicy"]


@struct.dataclass
class TrainState:
    """Generic learnable state; algorithms may subclass with extra fields.

    ``ret_mean/ret_var/ret_count`` carry the running statistics of
    UNNORMALIZED returns for on-policy return normalization (the
    reference's ``ret_rms``, ``policy/modelfree/a2c.py:132-139``); None
    for algorithms that do not use it.
    """

    params: Any
    opt_state: Any
    step: jax.Array
    target_params: Any = None
    ret_mean: jax.Array | None = None
    ret_var: jax.Array | None = None
    ret_count: jax.Array | None = None


def polyak_update(target: Any, online: Any, tau: float) -> Any:
    """Soft target update: ``target <- (1 - tau) * target + tau * online``."""
    return jax.tree.map(lambda t, o: (1.0 - tau) * t + tau * o, target, online)


class Algorithm:
    """Static algorithm configuration.

    Subclasses implement :meth:`init`, :meth:`act` and (for off-policy)
    :meth:`update` or (for on-policy) :meth:`process_rollout`+:meth:`learn`.
    Instances must be safely shareable across jit traces: all array state
    lives in the TrainState, never on ``self``.
    """

    action_space: Space

    # -- lifecycle ---------------------------------------------------------
    def init(self, key: jax.Array, obs_example: Any) -> TrainState:
        raise NotImplementedError

    # -- acting ------------------------------------------------------------
    def act(
        self,
        ts: TrainState,
        obs: Any,
        key: jax.Array,
        explore: bool,
        explore_param: jax.Array | float = 0.0,
    ) -> tuple[jax.Array, Batch]:
        """Batched action selection.  Returns ``(action, extras)`` where
        ``extras`` carries per-step policy outputs to store alongside the
        transition (e.g. ``log_prob`` for PPO), possibly empty."""
        raise NotImplementedError

    def compute_action(
        self, ts: TrainState, obs: Any, key: jax.Array | None = None
    ) -> Any:
        """Single-observation inference helper (reference
        ``compute_action`` ``policy/base.py:290-313``): adds the batch dim,
        runs deterministic :meth:`act`, maps to the env action space and
        returns a host scalar/array."""
        import numpy as np

        key = key if key is not None else jax.random.key(0)
        obs_b = jax.tree.map(lambda x: jnp.asarray(x)[None], obs)
        act, _ = self.act(ts, obs_b, key, explore=False)
        act = self.map_action(act)
        out = np.asarray(act[0])
        if isinstance(self.action_space, Discrete):
            return int(out)
        return out

    # -- recurrent-policy hooks (reference RecurrentStateBatch plumbing,
    # ``collector.py:400-443``) --------------------------------------------
    def init_policy_state(self, num_envs: int) -> Any:
        """Per-env recurrent state carried through the rollout scan; ``()``
        for feedforward policies."""
        return ()

    def act_with_state(
        self,
        ts: TrainState,
        obs: Any,
        policy_state: Any,
        key: jax.Array,
        explore: bool,
        explore_param: jax.Array | float = 0.0,
    ) -> tuple[jax.Array, Batch, Any]:
        """Stateful acting; default delegates to the stateless :meth:`act`."""
        act, extras = self.act(ts, obs, key, explore, explore_param)
        return act, extras, policy_state

    # -- host acting-parameter sync ------------------------------------
    def act_params(self, ts: TrainState) -> Any | None:
        """The minimal sub-pytree of ``ts`` that :meth:`act` reads, or
        ``None`` when unknown.

        The host collector pulls ONLY this subtree from the accelerator
        per collect segment, packed into a single flat transfer (the
        acting side of the reference's shared-memory parameter hand-off,
        SURVEY.md §2.1): over a tunneled accelerator every transfer costs
        ~25 ms of latency, so a per-leaf pull of the full train state
        (params + targets + optimizer moments, dozens of leaves) costs
        seconds while one packed actor-subtree transfer costs one RTT.
        ``None`` (the default) makes the collector fall back to syncing
        the full train state per-leaf — always correct, never fast."""
        return None

    def with_act_params(self, ts: TrainState, sub: Any) -> TrainState:
        """Graft a subtree returned by :meth:`act_params` back onto a
        (host-resident) ``ts``; the non-acting leaves stay stale, which is
        sound because :meth:`act` never reads them."""
        raise NotImplementedError

    def map_action(self, act: jax.Array) -> jax.Array:
        """Map the policy's internal action to the env's action space.

        Continuous policies emit actions in ``[-1, 1]``; this affinely
        rescales to the Box bounds (reference ``map_action``
        ``policy/base.py:365-426``).  Discrete spaces pass through.
        """
        space = self.action_space
        if isinstance(space, (Discrete, MultiDiscrete)):
            return act
        assert isinstance(space, Box)
        lo, hi = space.low_arr(), space.high_arr()
        act = jnp.clip(act, -1.0, 1.0)
        return lo + (act + 1.0) * 0.5 * (hi - lo)

    # -- shared off-policy sampling ----------------------------------------
    def _sample_nstep(
        self,
        buffer: ReplayBuffer,
        bstate: ReplayBufferState,
        key: jax.Array,
        batch_size: int,
        n_step: int,
    ):
        """Sample + gather the n-step structure every off-policy update
        needs: ``(env_idx, pos, weight, batch{obs,act}, rew_chain [B,n],
        done_chain [B,n], term{obs_next, terminated})``.

        Dispatches on HER buffers (hindsight goal rewrite happens here, so
        algorithms stay goal-agnostic; requires ``n_step == 1``)."""
        from tianshou_tpu.data.her import HERReplayBuffer

        if isinstance(buffer, HERReplayBuffer):
            assert n_step == 1, "HER supports 1-step targets"
            env_idx, pos, weight, b = buffer.sample_her(bstate, key, batch_size)
            rew_chain = b["rew"][:, None]
            done_chain = (b["terminated"] | b["truncated"]).astype(jnp.int32)[
                :, None
            ]
            term = Batch(obs_next=b["obs_next"], terminated=b["terminated"])
            return env_idx, pos, weight, b, rew_chain, done_chain, term
        env_idx, pos, weight = buffer.sample_with_weights(bstate, key, batch_size)
        batch = buffer.get(bstate, env_idx, pos, keys=("obs", "act"))
        rew_chain, done_chain, term_pos = buffer.nstep_chain(
            bstate, env_idx, pos, n_step
        )
        term = buffer.get(
            bstate, env_idx, term_pos, keys=("obs_next", "terminated")
        )
        return env_idx, pos, weight, batch, rew_chain, done_chain, term

    # -- learning (off-policy / offline) ------------------------------------
    #: algorithms whose :meth:`update` factors into ``_sample_nstep`` +
    #: :meth:`update_sampled` set this True, which lets the trainer hoist
    #: ONE gather of ``k * batch`` indices + n-step chains out of the
    #: k-update scan (the batched multi-update sampling optimization;
    #: exact semantics for uniform replay, where sampling does not depend
    #: on the updates in between).
    supports_presampled = False

    def presample(
        self,
        buffer: ReplayBuffer,
        bstate: ReplayBufferState,
        key: jax.Array,
        batch_size: int,
    ) -> tuple:
        """The gather stage of :meth:`update` (indices, weights, n-step
        chains): a pure pytree of ``[batch_size, ...]`` leaves that
        :meth:`update_sampled` consumes.  The trainer exploits this split
        to gather ``k * batch`` samples in ONE call outside the k-update
        scan (batched multi-update sampling — exact for uniform replay)."""
        return self._sample_nstep(buffer, bstate, key, batch_size, self.n_step)

    def update_sampled(
        self,
        ts: TrainState,
        buffer: ReplayBuffer,
        bstate: ReplayBufferState,
        sampled: tuple,
        key: jax.Array,
    ) -> tuple[TrainState, ReplayBufferState, dict[str, jax.Array]]:
        """One gradient step from a pre-sampled :meth:`presample` tuple."""
        raise NotImplementedError

    def priority_scores(self, ts: TrainState, sampled: tuple, key=None):
        """Per-sample priority under the (pre-update) params for PER
        write-back when the update runs where the buffer is not reachable
        (the distributed trainer's process-local write-back; reference
        ``post_process_fn`` semantics, ``policy/base.py:480-502``).

        ``key`` is the SAME key the update step consumed; implementations
        that sample inside their target computation (SAC next-actions, TD3
        smoothing noise, REDQ subsets, noisy nets) mirror the update's key
        splits so the recomputed priority is bit-identical to what
        ``update_sampled`` writes back locally.  Returns ``None`` when the
        algorithm does not support it."""
        return None

    def update(
        self,
        ts: TrainState,
        buffer: ReplayBuffer,
        bstate: ReplayBufferState,
        key: jax.Array,
        batch_size: int,
    ) -> tuple[TrainState, ReplayBufferState, dict[str, jax.Array]]:
        """One gradient step: sample -> targets -> SGD.  Returns the (possibly
        updated) buffer state so PER priority write-back (the reference's
        ``post_process_fn``) stays functional."""
        if not self.supports_presampled:
            raise NotImplementedError
        k_s, k_l = jax.random.split(key)
        sampled = self.presample(buffer, bstate, k_s, batch_size)
        return self.update_sampled(ts, buffer, bstate, sampled, k_l)

    # -- learning (on-policy) ------------------------------------------------
    def process_rollout(
        self, ts: TrainState, traj: Batch
    ) -> Batch:
        """Enrich a time-major ``[T, N, ...]`` rollout (advantages, returns,
        old log-probs) before minibatch learning."""
        raise NotImplementedError

    def update_rollout_stats(self, ts: TrainState, traj: Batch) -> TrainState:
        """Once-per-rollout train-state update (e.g. running return
        statistics for return normalization); the on-policy trainers call
        this right after :meth:`process_rollout` on the fresh rollout.
        Default: identity."""
        return ts

    def learn(
        self, ts: TrainState, minibatch: Batch, key: jax.Array
    ) -> tuple[TrainState, dict[str, jax.Array]]:
        raise NotImplementedError


class RandomPolicy(Algorithm):
    """Uniform random actions (reference ``policy/random.py:19``); used for
    warm-up collection before learning starts."""

    def __init__(self, action_space: Space):
        self.action_space = action_space

    def init(self, key: jax.Array, obs_example: Any) -> TrainState:
        return TrainState(params=(), opt_state=(), step=jnp.zeros((), jnp.int32))

    def act(self, ts, obs, key, explore, explore_param=0.0):
        leaves = jax.tree_util.tree_leaves(obs)
        bsz = leaves[0].shape[0]
        space = self.action_space
        if isinstance(obs, Batch) and "mask" in obs:
            # uniform over legal actions (MARL action masks)
            g = jax.random.gumbel(key, obs["mask"].shape)
            a = jnp.argmax(
                jnp.where(obs["mask"].astype(bool), g, -jnp.inf), axis=-1
            ).astype(jnp.int32)
        elif isinstance(space, Box):
            # internal convention: continuous actions live in [-1, 1]
            a = jax.random.uniform(key, (bsz,) + space.shape, minval=-1.0, maxval=1.0)
        else:
            a = space.sample(key, (bsz,))
        return a, Batch()
