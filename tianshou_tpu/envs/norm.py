"""Observation-normalizing vectorized env (functional).

Counterpart of ``tianshou/env/venv_wrappers.py:69`` (``VectorEnvNormObs``):
running mean/std obs normalization that updates during training and stays
frozen for test envs.  Because envs here are pure functions, the running
statistics are part of the carried env state (a ``(inner_state, rms)``
tuple) and flow through the jitted rollout scan; ``get_rms``/``with_rms``
replace the reference's ``get_obs_rms``/``set_obs_rms`` persistence hooks.
"""

from __future__ import annotations

from typing import Any

import jax

from tianshou_tpu.envs.base import JaxEnv, StepResult, VectorEnv
from tianshou_tpu.utils.statistics import (
    RunningMeanStdState,
    rms_init,
    rms_normalize,
    rms_update,
)

__all__ = ["NormObsVectorEnv"]


class NormObsVectorEnv(VectorEnv):
    def __init__(
        self,
        env: JaxEnv,
        num_envs: int,
        update_rms: bool = True,
        clip: float = 10.0,
    ):
        super().__init__(env, num_envs)
        self.update_rms = update_rms
        self.clip = clip

    def reset(self, key: jax.Array):
        inner_state, obs = super().reset(key)
        rms = rms_init(obs.shape[1:])
        if self.update_rms:
            rms = rms_update(rms, obs)
        return (inner_state, rms), rms_normalize(rms, obs, self.clip)

    def step(self, state: Any, action: jax.Array, key: jax.Array):
        inner_state, rms = state
        inner_state, res, carry_obs = super().step(inner_state, action, key)
        if self.update_rms:
            rms = rms_update(rms, res.obs)
        res = StepResult(
            obs=rms_normalize(rms, res.obs, self.clip),
            reward=res.reward,
            terminated=res.terminated,
            truncated=res.truncated,
        )
        carry_obs = rms_normalize(rms, carry_obs, self.clip)
        return (inner_state, rms), res, carry_obs

    # -- rms transfer (train -> frozen test env) ---------------------------
    @staticmethod
    def get_rms(env_state: Any) -> RunningMeanStdState:
        return env_state[1]

    @staticmethod
    def with_rms(env_state: Any, rms: RunningMeanStdState) -> Any:
        return (env_state[0], rms)
