"""Test fixtures: deterministic envs (the analog of the reference's
``test/base/env.py`` ``MoveToRightEnv``)."""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.envs.base import JaxEnv, StepResult
from tianshou_tpu.envs.spaces import Box, Discrete


class CorridorState(NamedTuple):
    pos: jax.Array
    t: jax.Array


class MoveToRight(JaxEnv):
    """1-D corridor: action 1 moves right, 0 stays.  Reaching ``size``
    terminates with reward 1; otherwise reward 0; truncates at ``max_t``.
    Fully deterministic — used to assert exact buffer contents, mirroring
    the reference's ``test_collector.py`` strategy."""

    observation_space = Box(low=0.0, high=100.0, shape=(1,))
    action_space = Discrete(2)

    def __init__(self, size: int = 3, max_t: int = 100):
        self.size = size
        self.max_t = max_t

    def reset(self, key: jax.Array):
        state = CorridorState(jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    @staticmethod
    def _obs(s: CorridorState) -> jax.Array:
        return s.pos.astype(jnp.float32)[None]

    def step(self, state: CorridorState, action: jax.Array):
        pos = state.pos + action.astype(jnp.int32)
        new = CorridorState(pos, state.t + 1)
        terminated = pos >= self.size
        truncated = (new.t >= self.max_t) & ~terminated
        reward = jnp.where(terminated, 1.0, 0.0).astype(jnp.float32)
        return new, StepResult(self._obs(new), reward, terminated, truncated)


class GoalState(NamedTuple):
    pos: jax.Array
    goal: jax.Array
    t: jax.Array


class GoalReachEnv(JaxEnv):
    """Sparse-reward 1-D goal reaching (the analog of the reference's
    ``MyGoalEnv`` HER fixture, ``test/base/env.py:207-246``): obs is
    ``[pos, achieved(=pos), desired(=goal)]``; reward -1 until the goal is
    reached (then 0, terminated)."""

    SIZE = 8.0
    TOL = 0.5
    MAX_T = 16

    observation_space = Box(low=-10.0, high=10.0, shape=(3,))
    action_space = Box(low=-1.0, high=1.0, shape=(1,))

    def reset(self, key: jax.Array):
        goal = jax.random.uniform(key, (), minval=1.0, maxval=self.SIZE)
        state = GoalState(jnp.zeros(()), goal, jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    @staticmethod
    def _obs(s: GoalState) -> jax.Array:
        return jnp.stack([s.pos, s.pos, s.goal]).astype(jnp.float32)

    def step(self, state: GoalState, action: jax.Array):
        pos = jnp.clip(state.pos + action.reshape(()), 0.0, self.SIZE)
        new = GoalState(pos, state.goal, state.t + 1)
        reached = jnp.abs(pos - state.goal) <= self.TOL
        reward = jnp.where(reached, 0.0, -1.0).astype(jnp.float32)
        return new, StepResult(
            obs=self._obs(new),
            reward=reward,
            terminated=reached,
            truncated=(new.t >= self.MAX_T) & ~reached,
        )

    @staticmethod
    def compute_reward(achieved: jax.Array, desired: jax.Array) -> jax.Array:
        return jnp.where(
            jnp.abs(achieved[:, 0] - desired[:, 0]) <= GoalReachEnv.TOL, 0.0, -1.0
        )
