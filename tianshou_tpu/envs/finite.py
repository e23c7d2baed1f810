"""Finite vectorized environments: iterate a fixed dataset as episodes
exactly once.

Counterpart of the reference's finite-env pattern
(``test/base/test_env_finite.py:12-120``, issue #322 there): environments
are backed by a finite stream of episodes (a validation dataset, a replay
of logged sessions); when an env's stream is exhausted its ``reset``
returns ``None`` and the vector env marks it dead, masking it with a
default observation until every env is exhausted.  One full pass over the
dataset = every episode seen exactly once across all envs.

The dead-env masking is inherently host-side control flow (ragged episode
streams, data loaders), so this lives on the host path; the device acts on
the batched observations exactly as with :class:`HostVectorEnv`.
"""

from __future__ import annotations

import copy
from typing import Any

import jax
import numpy as np

from tianshou_tpu.envs.host import HostStepResult, HostVectorEnv

__all__ = [
    "FiniteHostVectorEnv",
    "collect_dataset_episodes",
    "FiniteEvalCollector",
]


class FiniteHostVectorEnv(HostVectorEnv):
    """HostVectorEnv over envs whose ``reset`` returns ``(None, info)`` when
    their episode stream is exhausted.

    - ``alive``: bool mask of envs still producing real transitions.
    - Dead envs are masked with a default observation and emit
      ``reward 0, terminated False`` — their fake steps must be EXCLUDED
      from any metric (use :func:`collect_dataset_episodes` or filter on
      the alive mask returned by :meth:`step_masked`).
    - When all envs are dead, the pass is complete (``exhausted``); the
      next :meth:`reset` starts a fresh pass (mirroring the reference's
      ``_reset_alive_envs``).
    """

    def __init__(self, env_fns, **kwargs):
        super().__init__(env_fns, **kwargs)
        self.alive = np.ones(self.num_envs, bool)
        self._default_obs: np.ndarray | None = None

    @property
    def exhausted(self) -> bool:
        return not self.alive.any()

    def _try_reset_env(self, i: int) -> Any:
        """Reset env ``i``; mark dead (and return the default obs) on
        exhaustion."""
        obs, _ = self.envs[i].reset()
        if obs is None:
            self.alive[i] = False
            return copy.deepcopy(self._default_obs)
        if self._default_obs is None:
            self._default_obs = copy.deepcopy(obs)
        return obs

    def reset(self, seed: int | None = None) -> np.ndarray:
        # a finished pass restarts: every env gets a fresh stream
        self.alive = np.ones(self.num_envs, bool)
        obs = [self._try_reset_env(i) for i in range(self.num_envs)]
        if self._default_obs is None:
            raise RuntimeError("every env exhausted on first reset")
        obs = [o if o is not None else copy.deepcopy(self._default_obs) for o in obs]
        from tianshou_tpu.envs.host import _stack_obs

        return _stack_obs(obs)

    def step(self, actions: np.ndarray) -> tuple[HostStepResult, np.ndarray]:
        res, carry, _ = self.step_masked(actions)
        return res, carry

    def step_masked(self, actions: np.ndarray):
        """Step alive envs; returns ``(result, carry, was_alive)`` where
        ``was_alive`` marks rows holding REAL transitions this tick."""
        was_alive = self.alive.copy()
        n = self.num_envs
        d = copy.deepcopy(self._default_obs)
        obs_l = [d] * n
        rew = np.zeros(n, np.float32)
        term = np.zeros(n, bool)
        trunc = np.zeros(n, bool)
        carry_l = [d] * n
        for i in range(n):
            if not was_alive[i]:
                continue
            obs, r, te, tr, _ = self.envs[i].step(actions[i])
            obs_l[i] = obs
            rew[i] = r
            term[i] = te
            trunc[i] = tr
            carry_l[i] = (
                self._try_reset_env(i) if (te or tr) else obs
            )
        from tianshou_tpu.envs.host import _stack_obs

        return (
            HostStepResult(_stack_obs(obs_l), rew, term, trunc),
            _stack_obs(carry_l),
            was_alive,
        )


def collect_dataset_episodes(
    algo,
    ts,
    venv: FiniteHostVectorEnv,
    key: jax.Array,
    explore: bool = False,
    explore_param: float = 0.0,
    max_steps: int = 1_000_000,
):
    """Run the policy over one FULL pass of the dataset (every episode
    exactly once) and return ``(returns, lens)`` arrays.

    The dataset-epoch evaluation loop of the reference's finite-env
    pattern: terminates when the vector env is exhausted, counting only
    real (alive-env) transitions."""
    from functools import partial

    @partial(jax.jit, static_argnames=("explore",))
    def act(ts, obs, key, explore, p):
        a, _ = algo.act(ts, obs, key, explore, p)
        return algo.map_action(a)

    obs = venv.reset()
    n = venv.num_envs
    ep_ret = np.zeros(n)
    ep_len = np.zeros(n, np.int64)
    returns: list[float] = []
    lens: list[int] = []
    for _ in range(max_steps):
        if venv.exhausted:
            break
        key, k = jax.random.split(key)
        acts = np.asarray(act(ts, jax.numpy.asarray(obs), k, explore, explore_param))
        res, carry, was_alive = venv.step_masked(acts)
        ep_ret[was_alive] += res.reward[was_alive]
        ep_len[was_alive] += 1
        done = (res.terminated | res.truncated) & was_alive
        for i in np.nonzero(done)[0]:
            returns.append(float(ep_ret[i]))
            lens.append(int(ep_len[i]))
            ep_ret[i] = 0.0
            ep_len[i] = 0
        obs = carry
    return np.asarray(returns), np.asarray(lens, np.int64)


class FiniteEvalCollector:
    """Test-collector adapter over a :class:`FiniteHostVectorEnv`: every
    ``collect_episodes`` call runs ONE full pass of the dataset (each
    episode exactly once) and reports its stats.

    This plugs dataset-epoch evaluation into the standard trainers as the
    ``test_collector`` — the role the reference's finite-env pattern plays
    inside a training run (``test/base/test_env_finite.py``): per-epoch
    evaluation over a fixed validation set instead of sampled episodes.
    The ``n_episode`` argument is ignored by design (the dataset defines
    the episode count); a quota would break exactly-once semantics.
    """

    def __init__(self, algo, venv: FiniteHostVectorEnv):
        self.algo = algo
        self.venv = venv

    def collect_episodes(
        self,
        ts,
        key: jax.Array,
        n_episode: int | None = None,
        explore: bool = False,
        explore_param: float = 0.0,
        **_: Any,
    ):
        from tianshou_tpu.collect.collector import CollectStats

        returns, lens = collect_dataset_episodes(
            self.algo, ts, self.venv, key, explore, explore_param
        )
        return CollectStats(
            n_collected_steps=int(lens.sum()),
            n_collected_episodes=int(len(returns)),
            returns=returns,
            lens=lens,
        )
