"""PettingZoo AEC adapter for host multi-agent environments.

Counterpart of ``tianshou/env/pettingzoo_env.py:21`` (``PettingZooEnv``):
wraps a PettingZoo AEC env into the framework's turn-based convention —
observations are dicts ``{agent_id, obs, mask}`` and rewards are per-agent
vectors ordered by ``possible_agents`` — with a gymnasium-style
``reset/step`` surface so it slots into :class:`HostVectorEnv` +
:class:`MultiAgentPolicyManager` unchanged.  Homogeneous agent spaces are
asserted like the reference does.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from tianshou_tpu.envs.spaces import Box, Discrete

__all__ = ["PettingZooEnv"]


class PettingZooEnv:
    def __init__(self, aec_env: Any):
        self.env = aec_env
        self.env.reset()
        self.agents = list(self.env.possible_agents)
        self.agent_idx = {a: i for i, a in enumerate(self.agents)}
        self.num_agents = len(self.agents)

        obs_space = self.env.observation_space(self.agents[0])
        act_space = self.env.action_space(self.agents[0])
        # homogeneous spaces required (reference pettingzoo_env.py asserts)
        for a in self.agents[1:]:
            assert self.env.observation_space(a) == obs_space
            assert self.env.action_space(a) == act_space
        if hasattr(obs_space, "spaces") and "observation" in obs_space.spaces:
            inner = obs_space.spaces["observation"]
        else:
            inner = obs_space
        dim = int(np.prod(inner.shape))
        self.observation_space = Box(low=-np.inf, high=np.inf, shape=(dim,))
        self.action_space = Discrete(int(act_space.n))

    # -- protocol helpers ---------------------------------------------------
    def _wrap_obs(self) -> dict:
        agent = self.env.agent_selection
        raw = self.env.observe(agent)
        if isinstance(raw, dict) and "observation" in raw:
            obs = np.asarray(raw["observation"], np.float32).reshape(-1)
            mask = np.asarray(raw["action_mask"], np.float32)
        else:
            obs = np.asarray(raw, np.float32).reshape(-1)
            mask = np.ones(self.action_space.n, np.float32)
        return {
            "obs": obs,
            "mask": mask,
            "agent_id": np.int32(self.agent_idx[agent]),
        }

    # -- gymnasium-style surface --------------------------------------------
    def reset(self, seed: int | None = None):
        self.env.reset(seed=seed)
        return self._wrap_obs(), {}

    def step(self, action):
        self.env.step(int(action))
        rew_vec = np.asarray(
            [self.env.rewards.get(a, 0.0) for a in self.agents], np.float32
        )
        agent = self.env.agent_selection
        term = bool(self.env.terminations[agent])
        trunc = bool(self.env.truncations[agent])
        obs = self._wrap_obs()  # terminal obs before draining
        if term or trunc:
            # drain remaining agents so the AEC episode fully closes
            while self.env.agents:
                self.env.step(None)
        return obs, rew_vec, term, trunc, {}

    def close(self):
        self.env.close()
