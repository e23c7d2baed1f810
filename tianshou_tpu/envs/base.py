"""Functional environment API for on-device rollouts.

TPU-native replacement for the reference's vectorized-env layer
(``tianshou/env/venvs.py:25`` ``BaseVectorEnv`` + process workers): instead of
process-per-env workers exchanging observations over pipes/shared memory,
environments are pure functions of an explicit state pytree, stepped in
lockstep for thousands of instances under ``vmap`` inside the jitted rollout
(`SURVEY.md` §2.4 env/actor-parallelism row).  Host-process envs (MuJoCo,
Atari, ...) are served by a separate bridge in ``envs/host.py``.

Contract:
- ``reset(key) -> (state, obs)``; ``state`` is an arbitrary pytree that must
  carry any PRNG needs of the env (stochastic envs split a key stored in
  their state).
- ``step(state, action) -> (state, StepResult)`` with fixed-shape leaves.
- truncation (time limits) is internal to the env state, matching gymnasium's
  terminated/truncated split that the reference collectors consume
  (``data/collector.py:519-521``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.envs.spaces import Space

__all__ = ["StepResult", "JaxEnv", "VectorEnv"]


class StepResult(NamedTuple):
    obs: Any
    reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array

    @property
    def done(self) -> jax.Array:
        return self.terminated | self.truncated


class JaxEnv:
    """Base class for pure functional envs (stateless; config only)."""

    observation_space: Space
    action_space: Space

    def reset(self, key: jax.Array) -> tuple[Any, Any]:
        raise NotImplementedError

    def step(self, state: Any, action: jax.Array) -> tuple[Any, StepResult]:
        raise NotImplementedError


class VectorEnv:
    """N lockstep instances of a :class:`JaxEnv` with functional auto-reset.

    Auto-reset semantics match what the reference collector implements in
    Python (``data/collector.py:566-590``): when an instance finishes, the
    returned ``obs`` for the next step is the *reset* observation of a fresh
    episode, while ``result.obs`` (exposed to the buffer as ``obs_next``)
    remains the terminal observation.  :meth:`step` therefore returns both.
    """

    def __init__(self, env: JaxEnv, num_envs: int):
        self.env = env
        self.num_envs = num_envs
        self.observation_space = env.observation_space
        self.action_space = env.action_space

    def reset(self, key: jax.Array) -> tuple[Any, Any]:
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self.env.reset)(keys)

    def step(
        self, state: Any, action: jax.Array, key: jax.Array
    ) -> tuple[Any, StepResult, Any]:
        """Step all envs; auto-reset finished ones.

        Returns ``(new_state, result, carry_obs)`` where ``result`` holds the
        true transition (terminal obs on done) and ``carry_obs`` is the
        observation to act on next step (reset obs where done).
        """
        state, result = jax.vmap(self.env.step)(state, action)
        reset_keys = jax.random.split(key, self.num_envs)
        reset_state, reset_obs = jax.vmap(self.env.reset)(reset_keys)
        done = result.terminated | result.truncated

        def _sel(a, b):
            c = done.reshape(done.shape + (1,) * (jnp.ndim(a) - done.ndim))
            return jnp.where(c, a, b)

        new_state = jax.tree.map(_sel, reset_state, state)
        carry_obs = jax.tree.map(_sel, reset_obs, result.obs)
        return new_state, result, carry_obs
