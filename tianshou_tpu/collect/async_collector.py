"""Asynchronous host collection: partial-wait env stepping.

TPU-native counterpart of the reference's async venv mode
(``env/venvs.py:288-310``: ``wait_num``/``timeout`` partial waits over
worker connections) and ``AsyncCollector`` (``data/collector.py:671-943``):
slow environments never block fast ones.  Each env steps in its own future
on the shared thread pool; the collector waits for at least ``wait_num``
ready envs (or ``timeout``), acts on the ready subset (the jitted act
function always sees the full fixed-shape observation batch — stale rows
are masked out), resubmits, and stages transitions until the step budget is
met.  Ready-env bookkeeping replaces the reference's
``info["env_id"]``-based re-derivation.
"""

from __future__ import annotations

from concurrent.futures import FIRST_COMPLETED, Future, ThreadPoolExecutor, wait
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algos.base import Algorithm, TrainState
from tianshou_tpu.collect.collector import CollectStats
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.envs.host import space_from_gym

__all__ = ["AsyncHostVectorEnv", "AsyncHostCollector"]


class AsyncHostVectorEnv:
    """Per-env future-based stepping with partial waits."""

    is_host_env = True

    def __init__(
        self,
        env_fns: Sequence[Callable[[], Any]],
        wait_num: int | None = None,
        timeout: float | None = None,
        max_workers: int | None = None,
    ):
        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        self.wait_num = wait_num or max(1, self.num_envs // 2)
        self.timeout = timeout
        self.observation_space = space_from_gym(self.envs[0].observation_space)
        self.action_space = space_from_gym(self.envs[0].action_space)
        self.pool = ThreadPoolExecutor(max_workers=max_workers or self.num_envs)
        self._futures: dict[int, Future] = {}

    def reset(self, seed: int | None = None) -> np.ndarray:
        for f in self._futures.values():
            f.cancel()
        self._futures.clear()
        seeds = (
            [seed + i for i in range(self.num_envs)]
            if seed is not None
            else [None] * self.num_envs
        )
        obs = [e.reset(seed=s)[0] for e, s in zip(self.envs, seeds)]
        return np.stack(obs).astype(np.float32)

    def step_async(self, env_id: int, action) -> None:
        """Submit one env's step; its result arrives via :meth:`wait`."""
        assert env_id not in self._futures, f"env {env_id} already stepping"

        def _one(env=self.envs[env_id], act=action):
            obs, rew, term, trunc, info = env.step(act)
            if term or trunc:
                carry, _ = env.reset()
            else:
                carry = obs
            return obs, rew, term, trunc, carry

        self._futures[env_id] = self.pool.submit(_one)

    def wait(self) -> list[tuple[int, tuple]]:
        """Block until >= ``wait_num`` in-flight steps finish (or timeout);
        returns ``[(env_id, (obs, rew, term, trunc, carry)), ...]``."""
        if not self._futures:
            return []
        want = min(self.wait_num, len(self._futures))
        done_set: set = set()
        while len(done_set) < want:
            done, _ = wait(
                list(self._futures.values()),
                timeout=self.timeout,
                return_when=FIRST_COMPLETED,
            )
            done_set |= done
            if self.timeout is not None and done_set:
                break
        out = []
        for env_id in list(self._futures):
            f = self._futures[env_id]
            if f in done_set and f.done():
                out.append((env_id, f.result()))
                del self._futures[env_id]
        return out

    def close(self) -> None:
        for f in self._futures.values():
            f.cancel()
        for e in self.envs:
            e.close()
        self.pool.shutdown(wait=False)


class AsyncHostCollector:
    """Collector over :class:`AsyncHostVectorEnv` (reference
    ``AsyncCollector``): acts for and re-dispatches only the ready envs."""

    is_host_collector = True

    def __init__(
        self,
        algo: Algorithm,
        venv: AsyncHostVectorEnv,
        buffer: ReplayBuffer | None = None,
    ):
        self.algo = algo
        self.venv = venv
        self.buffer = buffer
        self.obs: np.ndarray | None = None
        self.ep_ret = np.zeros(venv.num_envs)
        self.ep_len = np.zeros(venv.num_envs, np.int64)
        self._act_fns: dict = {}

    def _act_fn(self, explore: bool):
        if explore not in self._act_fns:
            algo = self.algo

            if self._has_state:

                @jax.jit
                def act(ts, obs, pstate, key, explore_param):
                    a, _, new_state = algo.act_with_state(
                        ts, obs, pstate, key, explore, explore_param
                    )
                    return a, algo.map_action(a), new_state

            else:

                @jax.jit
                def act(ts, obs, pstate, key, explore_param):
                    a, _ = algo.act(ts, obs, key, explore, explore_param)
                    return a, algo.map_action(a), pstate

            self._act_fns[explore] = act
        return self._act_fns[explore]

    def reset(self, seed: int = 0) -> None:
        self.obs = self.venv.reset(seed)
        self.ep_ret[:] = 0
        self.ep_len[:] = 0
        self._ready = list(range(self.venv.num_envs))
        # per-env in-flight bookkeeping: the action and the obs it was
        # computed from (envs dispatched in different rounds differ)
        self._inflight_act = None
        self._inflight_obs = None
        # per-env recurrent carries (LSTM etc.): advanced only for the rows
        # actually dispatched each round, reset on episode end — the async
        # analog of the device collector's policy_state threading
        # (collector.py:107-152; reference AsyncCollector keeps hidden
        # state in `self.data.state`, data/collector.py:583-586)
        self._policy_state = self.algo.init_policy_state(self.venv.num_envs)
        self._has_state = len(jax.tree_util.tree_leaves(self._policy_state)) > 0
        self._act_fns.clear()

    def collect(
        self,
        ts: TrainState,
        bstate: ReplayBufferState | None,
        num_steps: int,
        key: jax.Array,
        explore: bool = True,
        explore_param: float = 0.0,
    ):
        """Collect >= ``num_steps`` total env transitions (across envs,
        whichever finish first).  Returns ``(bstate, stats)``."""
        assert self.obs is not None, "call reset() first"
        act_fn = self._act_fn(explore)
        n = self.venv.num_envs
        collected = 0
        returns, lens = [], []
        staged: list[tuple[np.ndarray, Batch]] = []  # (mask, transition)
        while collected < num_steps:
            if self._ready:
                key, k_act = jax.random.split(key)
                # act over the full fixed-shape batch; use only ready rows
                _, env_act, new_state = act_fn(
                    ts, jnp.asarray(self.obs), self._policy_state, k_act,
                    explore_param,
                )
                if self._has_state:
                    # advance carries ONLY for the rows being dispatched;
                    # stale (in-flight) rows keep their pre-step carry
                    idx = jnp.asarray(self._ready)
                    self._policy_state = jax.tree.map(
                        lambda old, new: old.at[idx].set(new[idx]),
                        self._policy_state,
                        new_state,
                    )
                env_act = np.asarray(env_act)
                if self._inflight_act is None:
                    self._inflight_act = env_act.copy()
                    self._inflight_obs = self.obs.copy()
                for i in self._ready:
                    self.venv.step_async(i, env_act[i])
                    self._inflight_act[i] = env_act[i]
                    self._inflight_obs[i] = self.obs[i]
                self._ready = []
            results = self.venv.wait()
            if not results:
                continue
            mask = np.zeros(n, bool)
            tr = {
                "obs": self._inflight_obs.copy(),
                "act": self._inflight_act.copy(),
                "rew": np.zeros(n, np.float32),
                "terminated": np.zeros(n, bool),
                "truncated": np.zeros(n, bool),
                "obs_next": self.obs.copy(),
            }
            for env_id, (obs, rew, term, trunc, carry) in results:
                mask[env_id] = True
                tr["rew"][env_id] = rew
                tr["terminated"][env_id] = term
                tr["truncated"][env_id] = trunc
                tr["obs_next"][env_id] = obs
                self.ep_ret[env_id] += rew
                self.ep_len[env_id] += 1
                if term or trunc:
                    returns.append(float(self.ep_ret[env_id]))
                    lens.append(int(self.ep_len[env_id]))
                    self.ep_ret[env_id] = 0
                    self.ep_len[env_id] = 0
                    if self._has_state:
                        # fresh episode -> zero carry for this env
                        fresh = self.algo.init_policy_state(1)
                        self._policy_state = jax.tree.map(
                            lambda s, f: s.at[env_id].set(f[0]),
                            self._policy_state,
                            fresh,
                        )
                self.obs[env_id] = carry
                self._ready.append(env_id)
            staged.append((mask, Batch(tr)))
            collected += int(mask.sum())
        if self.buffer is not None and bstate is not None:
            for mask, tr in staged:
                bstate = self.buffer.add_masked(
                    bstate, tr.to_jax(), jnp.asarray(mask)
                )
        return bstate, CollectStats(
            n_collected_steps=collected,
            n_collected_episodes=len(returns),
            returns=np.asarray(returns),
            lens=np.asarray(lens, np.int64),
        )
