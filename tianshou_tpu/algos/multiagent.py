"""Multi-agent policy manager: per-agent dispatch over a shared buffer.

TPU-native counterpart of ``tianshou/policy/multiagent/mapolicy.py:66``
(``MultiAgentPolicyManager``): acting dispatches on ``obs.agent_id``
(``mapolicy.py:183+``) — here every sub-policy acts on the full batch and
the manager selects by agent id (fixed shapes; cheap for small agent
counts).  Learning mirrors ``process_fn``'s per-agent reward slicing + index
filtering (``mapolicy.py:120-160``): each sub-algorithm updates through a
buffer *view* that exposes its own reward column and zeroes the importance
weights of other agents' transitions — the functional analog of the
reference's ``_meta.rew`` swap trick.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from tianshou_tpu.algos.base import Algorithm, TrainState
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState

__all__ = ["MultiAgentPolicyManager"]


class _AgentBufferView(ReplayBuffer):
    """Presents the shared MARL buffer to one agent: its reward column as
    ``rew`` and IS weights masked to its own turns."""

    def __init__(self, base: ReplayBuffer, agent_idx: int):
        super().__init__(base.capacity, base.num_envs, base.stack_num)
        self._base = base
        self._agent = agent_idx

    def _view(self, state: ReplayBufferState) -> ReplayBufferState:
        storage = Batch(state.storage)
        storage["rew"] = state.storage["rew"][..., self._agent]
        return state.replace(storage=storage)

    def sample_with_weights(self, state, key, batch_size):
        env_idx, pos, w = self._base.sample_with_weights(state, key, batch_size)
        agent = state.storage["obs"]["agent_id"][env_idx, pos]
        w = w * (agent == self._agent).astype(jnp.float32)
        return env_idx, pos, w

    def get(self, state, env_idx, pos, keys=None):
        return ReplayBuffer.get(self, self._view(state), env_idx, pos, keys=keys)

    def nstep_chain(self, state, env_idx, pos, n_step):
        return ReplayBuffer.nstep_chain(
            self, self._view(state), env_idx, pos, n_step
        )

    def update_priorities(self, state, env_idx, pos, td_abs):
        return self._base.update_priorities(state, env_idx, pos, td_abs)

    def stacked_obs(self, state, env_idx, pos, stack_num=None, obs_key="obs"):
        return self._base.stacked_obs(state, env_idx, pos, stack_num, obs_key)


class MultiAgentPolicyManager(Algorithm):
    def __init__(self, policies: Sequence[Algorithm], num_agents: int | None = None):
        self.policies = list(policies)
        self.num_agents = num_agents or len(policies)
        assert len(self.policies) == self.num_agents
        self.action_space = self.policies[0].action_space

    # -- lifecycle ----------------------------------------------------------
    def init(self, key: jax.Array, obs_example: Any) -> tuple[TrainState, ...]:
        keys = jax.random.split(key, self.num_agents)
        return tuple(
            p.init(k, obs_example) for p, k in zip(self.policies, keys)
        )

    def replace_policy(
        self, ts: tuple, agent_idx: int, policy: Algorithm, sub_ts: TrainState
    ):
        """Swap one agent's policy+state (opponent substitution for
        evaluation / league play)."""
        self.policies[agent_idx] = policy
        return ts[:agent_idx] + (sub_ts,) + ts[agent_idx + 1:]

    # -- acting -------------------------------------------------------------
    def act(self, ts: tuple, obs: Batch, key: jax.Array, explore, explore_param=0.0):
        agent_id = obs["agent_id"]
        keys = jax.random.split(key, self.num_agents)
        acts = []
        for i, (p, sub_ts) in enumerate(zip(self.policies, ts)):
            a, _ = p.act(sub_ts, obs, keys[i], explore, explore_param)
            acts.append(a)
        stacked = jnp.stack(acts, axis=0)  # [A, N]
        sel = jnp.take_along_axis(
            stacked, agent_id.astype(jnp.int32)[None, :], axis=0
        ).squeeze(0)
        return sel, Batch()

    # -- learning -----------------------------------------------------------
    def update(
        self,
        ts: tuple,
        buffer: ReplayBuffer,
        bstate: ReplayBufferState,
        key: jax.Array,
        batch_size: int,
    ):
        keys = jax.random.split(key, self.num_agents)
        new_ts = []
        metrics: dict[str, jax.Array] = {}
        for i, (p, sub_ts) in enumerate(zip(self.policies, ts)):
            view = _AgentBufferView(buffer, i)
            sub_ts, bstate, m = p.update(sub_ts, view, bstate, keys[i], batch_size)
            new_ts.append(sub_ts)
            for k, v in m.items():
                metrics[f"agent{i}/{k}"] = v
        return tuple(new_ts), bstate, metrics
