"""Synthetic Atari-scale pixel environment for MXU benchmarking.

ALE (the real Atari emulator) is absent from this image, but the MXU story
of the framework must still be demonstrated at the reference's flagship
pixel scale (``examples/atari/atari_dqn.py``: 84x84x4 stacked frames,
NatureCNN, batch-512 updates).  :class:`SyntheticPixelEnv` is an honest
stand-in for *throughput* benchmarking only: it produces deterministic
84x84xC uint8 frames with CartPole-cost dynamics, so in a full DQN pipeline
the NatureCNN forward/backward dominates — exactly the compute profile of a
real Atari run whose env stepping lives on host CPUs.

It is NOT a learning benchmark (the frames carry almost no signal); return
curves on it are meaningless by design and no example uses it for training.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.envs.base import JaxEnv, StepResult
from tianshou_tpu.envs.spaces import Box, Discrete

__all__ = ["SyntheticPixelEnv"]


class SyntheticPixelState(NamedTuple):
    t: jax.Array  # step counter, int32
    seed: jax.Array  # per-episode phase, int32


class SyntheticPixelEnv(JaxEnv):
    """Deterministic uint8 pixel frames at Atari shape, trivial dynamics.

    Frames are a rolling interference pattern of three iotas plus the step
    counter and an episode phase — a handful of VPU elementwise ops per
    pixel, negligible next to any conv net consuming them.  Episodes
    truncate at ``episode_len`` (no termination), mirroring a time-limited
    Atari evaluation episode.
    """

    def __init__(
        self,
        height: int = 84,
        width: int = 84,
        channels: int = 4,
        num_actions: int = 6,
        episode_len: int = 512,
        channel_first: bool = False,
    ):
        """``channel_first=True`` emits ``[stack, H, W]`` frames — the
        reference Atari frame-stack layout (``atari_wrapper.py`` stacks
        channel-first), which is what the buffer's ``save_only_last_obs``
        memory option expects (newest frame at index -1)."""
        self.height = height
        self.width = width
        self.channels = channels
        self.episode_len = episode_len
        self.channel_first = channel_first
        shape = (
            (channels, height, width)
            if channel_first
            else (height, width, channels)
        )
        self.observation_space = Box(low=0.0, high=255.0, shape=shape)
        self.action_space = Discrete(num_actions)

    def _frame(self, t: jax.Array, seed: jax.Array) -> jax.Array:
        if self.channel_first:
            shape = (self.channels, self.height, self.width)
            ci, hi, wi = 0, 1, 2
        else:
            shape = (self.height, self.width, self.channels)
            ci, hi, wi = 2, 0, 1
        i = jax.lax.broadcasted_iota(jnp.int32, shape, hi)
        j = jax.lax.broadcasted_iota(jnp.int32, shape, wi)
        c = jax.lax.broadcasted_iota(jnp.int32, shape, ci)
        v = i * 17 + j * 29 + c * 101 + t * 13 + seed * 7
        return (v & 0xFF).astype(jnp.uint8)

    def reset(self, key: jax.Array):
        seed = jax.random.randint(key, (), 0, 1 << 20, dtype=jnp.int32)
        state = SyntheticPixelState(jnp.zeros((), jnp.int32), seed)
        return state, self._frame(state.t, state.seed)

    def step(self, state: SyntheticPixelState, action: jax.Array):
        t = state.t + 1
        new_state = SyntheticPixelState(t, state.seed)
        obs = self._frame(t, state.seed)
        # reward depends on (t, action) so the Q-head sees non-constant
        # targets; still content-free by design.
        reward = ((t + action.astype(jnp.int32)) % 7 == 0).astype(jnp.float32)
        terminated = jnp.zeros((), jnp.bool_)
        truncated = t >= self.episode_len
        return new_state, StepResult(obs, reward, terminated, truncated)
