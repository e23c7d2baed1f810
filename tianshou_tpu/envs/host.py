"""Host-process vectorized environments (gymnasium bridge).

TPU-native counterpart of the reference's process-worker venvs
(``tianshou/env/venvs.py:25`` + ``worker/subproc.py``) and its EnvPool
integration (``highlevel/env.py:323-360``): host envs (MuJoCo, Atari, any
gymnasium env) step in a shared thread pool — MuJoCo/ALE release the GIL, so
threads give EnvPool-style parallelism without pipe/pickle overhead — and
feed batched numpy observations to the device-side policy.  Auto-reset
follows the same semantics as the on-device ``VectorEnv``: ``StepResult.obs``
keeps the terminal observation while the returned carry obs is the fresh
episode's reset observation (``collector.py:566-590``).

``NormObsHostVectorEnv`` mirrors ``VectorEnvNormObs``
(``env/venv_wrappers.py:69``) with host-side running statistics and
train->test rms transfer.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor
from typing import Any, NamedTuple

import numpy as np

from tianshou_tpu.envs.spaces import Box, Discrete, MultiDiscrete
from tianshou_tpu.utils.statistics import RunningMeanStd

__all__ = ["HostVectorEnv", "NormObsHostVectorEnv", "space_from_gym"]


def space_from_gym(space) -> Any:
    """Convert a gymnasium space to our static space spec."""
    if isinstance(space, (Discrete, Box, MultiDiscrete)):
        return space  # already a native spec (e.g. PettingZooEnv adapter)
    if isinstance(space, dict):
        return {k: space_from_gym(v) for k, v in space.items()}
    import gymnasium as gym

    if isinstance(space, gym.spaces.Dict):
        # dict observations (goal envs, MARL convention) -> plain dict of
        # native specs, stacked leaf-wise by _stack_obs
        return {k: space_from_gym(v) for k, v in space.spaces.items()}
    if isinstance(space, gym.spaces.Discrete):
        return Discrete(int(space.n))
    if isinstance(space, gym.spaces.MultiDiscrete):
        return MultiDiscrete(tuple(int(n) for n in space.nvec))
    if isinstance(space, gym.spaces.Box):

        def bound(arr):
            # store a scalar when uniform, the full per-dim tuple otherwise
            # (never collapse heterogeneous bounds: map_action scaling
            # depends on exact per-dim values)
            a = np.asarray(arr, np.float64)
            if a.size == 0 or np.all(a == a.flat[0]):
                return float(a.flat[0]) if a.size else 0.0
            return tuple(a.reshape(-1).tolist())

        return Box(
            low=bound(space.low), high=bound(space.high),
            shape=tuple(space.shape),
        )
    raise TypeError(f"Unsupported gym space: {space}")


class HostStepResult(NamedTuple):
    obs: np.ndarray
    reward: np.ndarray
    terminated: np.ndarray
    truncated: np.ndarray


def _stack_obs(items: list) -> Any:
    """Stack per-env observations; supports dict observations (the MARL
    ``{obs, mask, agent_id}`` convention) leaf-wise."""
    if isinstance(items[0], dict):
        return {k: _stack_obs([it[k] for it in items]) for k in items[0]}
    return np.stack(items).astype(np.float32, copy=False) if np.asarray(
        items[0]
    ).dtype.kind == "f" else np.stack(items)


class HostVectorEnv:
    """N gymnasium envs stepped by a thread pool, with auto-reset."""

    is_host_env = True

    def __init__(
        self,
        env_fns: Sequence[Callable[[], Any]],
        max_workers: int | None = None,
    ):
        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        self.observation_space = space_from_gym(self.envs[0].observation_space)
        self.action_space = space_from_gym(self.envs[0].action_space)
        self.pool = ThreadPoolExecutor(
            max_workers=max_workers or min(32, self.num_envs)
        )

    # -- lifecycle ----------------------------------------------------------
    def seed(self, seed: int) -> None:
        self._seeds = [seed + i for i in range(self.num_envs)]

    def reset(self, seed: int | None = None) -> np.ndarray:
        seeds = (
            [seed + i for i in range(self.num_envs)]
            if seed is not None
            else [None] * self.num_envs
        )
        obs = list(
            self.pool.map(lambda ei: ei[0].reset(seed=ei[1])[0], zip(self.envs, seeds))
        )
        return _stack_obs(obs)

    def step(self, actions: np.ndarray) -> tuple[HostStepResult, np.ndarray]:
        """Step all envs; returns (true transition result, carry obs)."""

        def _one(args):
            env, act = args
            obs, rew, term, trunc, info = env.step(act)
            if term or trunc:
                carry, _ = env.reset()
            else:
                carry = obs
            return obs, rew, term, trunc, carry

        out = list(self.pool.map(_one, zip(self.envs, actions)))
        obs_l, rew_l, term_l, trunc_l, carry_l = zip(*out)
        return (
            HostStepResult(
                _stack_obs(list(obs_l)),
                np.stack(rew_l).astype(np.float32),
                np.stack(term_l).astype(bool),
                np.stack(trunc_l).astype(bool),
            ),
            _stack_obs(list(carry_l)),
        )

    def close(self) -> None:
        for env in self.envs:
            env.close()
        self.pool.shutdown(wait=False)


class NormObsHostVectorEnv(HostVectorEnv):
    def __init__(self, env_fns, update_rms: bool = True, **kwargs):
        super().__init__(env_fns, **kwargs)
        self.update_rms = update_rms
        self.rms = RunningMeanStd()

    def reset(self, seed: int | None = None) -> np.ndarray:
        obs = super().reset(seed)
        if self.update_rms:
            self.rms.update(obs)
        return self.rms.norm(obs).astype(np.float32)

    def step(self, actions):
        res, carry = super().step(actions)
        if self.update_rms:
            self.rms.update(res.obs)
        res = HostStepResult(
            self.rms.norm(res.obs).astype(np.float32),
            res.reward,
            res.terminated,
            res.truncated,
        )
        return res, self.rms.norm(carry).astype(np.float32)

    # rms persistence (reference get/set_obs_rms)
    def get_rms(self) -> RunningMeanStd:
        return self.rms

    def set_rms(self, rms: RunningMeanStd) -> None:
        self.rms = rms
