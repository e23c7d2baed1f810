"""Hindsight experience replay (HER, arXiv 1707.01495) as a pure
sampling-time transform.

TPU-native re-design of ``tianshou/data/buffer/her.py:11``
(``HERReplayBuffer``): where the reference temporarily rewrites buffer
contents in place and restores them afterwards (``her.py:48-61,100-188``),
here the rewrite is a pure function applied to the *sampled* batch — the
'future' strategy picks a random future transition within the same episode
(via saturating ``next_pos`` chains) and substitutes its achieved goal as
the desired goal, recomputing the reward.  No mutation, no restore pass.

Goal layout: observations are flat vectors with ``achieved_slice`` /
``desired_slice`` index ranges (TPU-friendly; the dict-obs layout of
gymnasium robotics maps onto this by concatenation).
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState

__all__ = ["HERReplayBuffer"]


class HERReplayBuffer(ReplayBuffer):
    def __init__(
        self,
        capacity: int,
        num_envs: int = 1,
        *,
        compute_reward_fn: Callable[[jax.Array, jax.Array], jax.Array],
        achieved_slice: tuple[int, int],
        desired_slice: tuple[int, int],
        horizon: int = 16,
        future_k: float = 8.0,
        stack_num: int = 1,
    ):
        super().__init__(capacity, num_envs, stack_num)
        self.compute_reward_fn = compute_reward_fn
        self.achieved_slice = achieved_slice
        self.desired_slice = desired_slice
        self.horizon = horizon
        # fraction of samples whose goals are rewritten (her.py future_p)
        self.future_p = 1.0 - 1.0 / future_k

    def _set_desired(self, obs: jax.Array, goal: jax.Array) -> jax.Array:
        d0, d1 = self.desired_slice
        return obs.at[:, d0:d1].set(goal)

    def _achieved(self, obs: jax.Array) -> jax.Array:
        a0, a1 = self.achieved_slice
        return obs[:, a0:a1]

    def sample_her(
        self, state: ReplayBufferState, key: jax.Array, batch_size: int
    ) -> tuple[jax.Array, jax.Array, jax.Array, Batch]:
        """Sample a 1-step batch with hindsight-rewritten goals/rewards.

        Returns ``(env_idx, pos, weight, batch)`` where ``batch`` has
        ``obs, act, rew, obs_next, terminated, truncated`` post-rewrite.
        """
        k_idx, k_future, k_mask = jax.random.split(key, 3)
        env_idx, pos = self.sample_indices(state, k_idx, batch_size)
        batch = self.get(state, env_idx, pos)

        # future positions: walk the saturating next-chain H steps, measure
        # where it saturates (= the episode remainder, bounded by horizon),
        # and sample the offset as ``round(uniform * remainder)`` — exactly
        # the reference's 'future' distribution (her.py:126-130), which is
        # uniform over the remainder instead of overweighting the terminal
        # transition when episodes are shorter than the horizon
        chain = [pos]
        cur = pos
        remainder = jnp.zeros((batch_size,), jnp.int32)
        for _ in range(self.horizon - 1):
            nxt = self.next_pos(state, env_idx, cur)
            remainder = remainder + (nxt != cur).astype(jnp.int32)
            cur = nxt
            chain.append(cur)
        chain = jnp.stack(chain, axis=1)  # [B, H]
        u = jax.random.uniform(k_future, (batch_size,))
        offset = jnp.round(u * remainder).astype(jnp.int32)
        future_pos = jnp.take_along_axis(chain, offset[:, None], axis=1).squeeze(1)

        future_obs_next = state.storage["obs_next"][env_idx, future_pos]
        new_goal = self._achieved(future_obs_next)
        rewrite = jax.random.uniform(k_mask, (batch_size,)) < self.future_p

        old_goal = batch["obs"][:, self.desired_slice[0]:self.desired_slice[1]]
        goal = jnp.where(rewrite[:, None], new_goal, old_goal)

        obs = self._set_desired(batch["obs"], goal)
        obs_next = self._set_desired(batch["obs_next"], goal)
        # Only relabeled rows get a recomputed reward; the rest keep the
        # stored reward (the reference rewrites rewards only for relabeled
        # episodes, her.py:146-160 — recomputing for all rows silently
        # corrupts shaped-reward envs whose stored reward differs from the
        # sparse goal reward).
        rew_hindsight = self.compute_reward_fn(
            self._achieved(batch["obs_next"]), goal
        ).astype(jnp.float32)
        rew = jnp.where(rewrite, rew_hindsight, batch["rew"])
        out = Batch(
            obs=obs,
            act=batch["act"],
            rew=rew,
            obs_next=obs_next,
            terminated=batch["terminated"],
            truncated=batch["truncated"],
        )
        weight = jnp.ones((batch_size,), jnp.float32)
        return env_idx, pos, weight, out
