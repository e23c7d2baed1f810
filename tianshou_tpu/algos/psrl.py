"""PSRL: posterior sampling for tabular reinforcement learning.

TPU-native counterpart of ``tianshou/policy/modelbased/psrl.py:153``
(``PSRLPolicy`` + ``PSRLModel`` ``psrl.py:24-151``): Dirichlet posterior
over transitions, Normal posterior over rewards, Thompson sampling of a
model followed by value iteration — all as fixed-shape jnp ops (VI is a
``lax.fori_loop``), consumed through the on-policy trainer (the reference
trains PSRL with ``OnpolicyTrainer``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from tianshou_tpu.algos.base import Algorithm
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.envs.spaces import Discrete

__all__ = ["PSRL"]


@struct.dataclass
class PSRLTrainState:
    trans_counts: jax.Array  # [S, A, S] Dirichlet pseudo-counts
    rew_sum: jax.Array  # [S, A]
    rew_count: jax.Array  # [S, A]
    policy_table: jax.Array  # [S] greedy action per state
    value_table: jax.Array  # [S]
    rng: jax.Array
    step: jax.Array


class PSRL(Algorithm):
    def __init__(
        self,
        num_states: int,
        action_space: Discrete,
        *,
        gamma: float = 0.95,
        prior_count: float = 1.0,
        vi_iters: int = 100,
        eps_explore: float = 0.0,
    ):
        self.num_states = num_states
        self.action_space = action_space
        self.num_actions = action_space.n
        self.gamma = gamma
        self.prior_count = prior_count
        self.vi_iters = vi_iters
        self.eps_explore = eps_explore

    def init(self, key: jax.Array, obs_example: Any) -> PSRLTrainState:
        S, A = self.num_states, self.num_actions
        return PSRLTrainState(
            trans_counts=jnp.full((S, A, S), self.prior_count),
            rew_sum=jnp.zeros((S, A)),
            rew_count=jnp.zeros((S, A)),
            policy_table=jnp.zeros((S,), jnp.int32),
            value_table=jnp.zeros((S,)),
            rng=key,
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def act(self, ts: PSRLTrainState, obs, key, explore, explore_param=0.0):
        s = jnp.asarray(obs).reshape(-1).astype(jnp.int32)
        a = ts.policy_table[s]
        if explore and self.eps_explore > 0:
            k1, k2 = jax.random.split(key)
            rand = jax.random.randint(k1, a.shape, 0, self.num_actions)
            take = jax.random.uniform(k2, a.shape) < self.eps_explore
            a = jnp.where(take, rand, a)
        return a.astype(jnp.int32), Batch()

    # ------------------------------------------------------------------
    def _resample_and_plan(self, ts: PSRLTrainState) -> PSRLTrainState:
        """Thompson-sample a model from the posterior and value-iterate."""
        k_model, rng = jax.random.split(ts.rng)
        # transition posterior: Dirichlet per (s, a)
        P = jax.random.dirichlet(k_model, ts.trans_counts)  # [S, A, S]
        R = ts.rew_sum / jnp.maximum(ts.rew_count, 1.0)  # posterior mean

        def vi_step(_, v):
            q = R + self.gamma * jnp.einsum("sat,t->sa", P, v)
            return q.max(axis=-1)

        v = jax.lax.fori_loop(
            0, self.vi_iters, vi_step, jnp.zeros((self.num_states,))
        )
        q = R + self.gamma * jnp.einsum("sat,t->sa", P, v)
        return ts.replace(
            policy_table=jnp.argmax(q, axis=-1).astype(jnp.int32),
            value_table=v,
            rng=rng,
            step=ts.step + 1,
        )

    # -- on-policy interface -------------------------------------------------
    def process_rollout(self, ts: PSRLTrainState, traj: Batch) -> Batch:
        out = Batch(
            obs=traj["obs"], act=traj["act"], rew=traj["rew"],
            obs_next=traj["obs_next"],
        )
        return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), out)

    def learn(self, ts: PSRLTrainState, mb: Batch, key: jax.Array):
        s = jnp.asarray(mb["obs"]).reshape(-1).astype(jnp.int32)
        a = mb["act"].astype(jnp.int32)
        s_next = jnp.asarray(mb["obs_next"]).reshape(-1).astype(jnp.int32)
        ts = ts.replace(
            trans_counts=ts.trans_counts.at[s, a, s_next].add(1.0),
            rew_sum=ts.rew_sum.at[s, a].add(mb["rew"]),
            rew_count=ts.rew_count.at[s, a].add(1.0),
        )
        ts = self._resample_and_plan(ts)
        return ts, {"value_mean": ts.value_table.mean()}
