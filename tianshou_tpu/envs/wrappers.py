"""Functional env wrappers (action-space adapters, truncation semantics).

Counterparts of ``tianshou/env/gym_wrappers.py:8-80``
(``ContinuousToDiscrete``, ``MultiDiscreteToDiscrete``,
``TruncatedAsTerminated``) for the pure-JAX env backend: each wrapper is
itself a :class:`JaxEnv` delegating to the inner env with a pure
action/result transform.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.envs.base import JaxEnv, StepResult
from tianshou_tpu.envs.spaces import Box, Discrete, MultiDiscrete

__all__ = [
    "ContinuousToDiscrete",
    "MultiDiscreteToDiscrete",
    "TruncatedAsTerminated",
    "FrameStack",
]


class FrameStack(JaxEnv):
    """Stack the last ``num_stack`` observations along a new leading axis
    (the Atari frame-stack convention, reference
    ``examples/atari/atari_wrapper.py`` FrameStack).

    Pairs with ``ReplayBuffer(stack_num=k, save_only_last_obs=True,
    ignore_obs_next=True)``: the env emits ``[k, ...]`` stacks for acting,
    while the buffer stores each frame exactly once and reconstructs stacks
    at sample time — the reference's deduplicated pixel-buffer layout.
    On reset the initial observation is repeated ``num_stack`` times.
    """

    def __init__(self, env: JaxEnv, num_stack: int):
        assert num_stack >= 1
        self.env = env
        self.num_stack = num_stack
        sp = env.observation_space
        assert isinstance(sp, Box), "FrameStack requires Box observations"
        self.observation_space = Box(
            low=sp.low * num_stack if isinstance(sp.low, tuple) else sp.low,
            high=sp.high * num_stack if isinstance(sp.high, tuple) else sp.high,
            shape=(num_stack,) + sp.shape,
        )
        self.action_space = env.action_space

    def _stack(self, frames: jax.Array, obs: jax.Array) -> jax.Array:
        return jnp.concatenate([frames[1:], obs[None]], axis=0)

    def reset(self, key):
        s, obs = self.env.reset(key)
        frames = jnp.tile(obs[None], (self.num_stack,) + (1,) * jnp.ndim(obs))
        return (s, frames), frames

    def step(self, state, action):
        s, frames = state
        s, res = self.env.step(s, action)
        frames = self._stack(frames, res.obs)
        return (s, frames), res._replace(obs=frames)


class ContinuousToDiscrete(JaxEnv):
    """Discretize each Box action dim into ``action_per_dim`` mesh points."""

    def __init__(self, env: JaxEnv, action_per_dim: int, force_multidiscrete: bool = False):
        assert isinstance(env.action_space, Box)
        self.env = env
        self.action_per_dim = action_per_dim
        dims = env.action_space.shape[0]
        self.observation_space = env.observation_space
        self.action_space = (
            Discrete(action_per_dim)
            if dims == 1 and not force_multidiscrete
            else MultiDiscrete((action_per_dim,) * dims)
        )
        low = np.broadcast_to(np.asarray(env.action_space.low), (dims,))
        high = np.broadcast_to(np.asarray(env.action_space.high), (dims,))
        self.mesh = jnp.asarray(
            np.stack(
                [np.linspace(lo, hi, action_per_dim) for lo, hi in zip(low, high)]
            ),
            jnp.float32,
        )  # [dims, action_per_dim]

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, action):
        idx = jnp.atleast_1d(action.astype(jnp.int32))  # [dims]
        cont = jnp.take_along_axis(self.mesh, idx[:, None], axis=1).squeeze(1)
        if isinstance(self.action_space, Discrete):
            cont = cont.reshape(self.env.action_space.shape)
        return self.env.step(state, cont)


class MultiDiscreteToDiscrete(JaxEnv):
    """Flatten a MultiDiscrete space into one Discrete via base encoding."""

    def __init__(self, env: JaxEnv):
        assert isinstance(env.action_space, MultiDiscrete)
        self.env = env
        nvec = np.asarray(env.action_space.nvec)
        self.bases = jnp.asarray(
            np.concatenate([np.cumprod(nvec[::-1])[::-1][1:], [1]]), jnp.int32
        )
        self.nvec = jnp.asarray(nvec, jnp.int32)
        self.observation_space = env.observation_space
        self.action_space = Discrete(int(np.prod(nvec)))

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, action):
        multi = (action.astype(jnp.int32) // self.bases) % self.nvec
        return self.env.step(state, multi)


class TruncatedAsTerminated(JaxEnv):
    """Report truncation as termination (reference ``gym_wrappers.py``)."""

    def __init__(self, env: JaxEnv):
        self.env = env
        self.observation_space = env.observation_space
        self.action_space = env.action_space

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, action):
        state, res = self.env.step(state, action)
        return state, StepResult(
            obs=res.obs,
            reward=res.reward,
            terminated=res.terminated | res.truncated,
            truncated=jnp.zeros_like(res.truncated),
        )
