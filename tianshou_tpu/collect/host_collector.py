"""Collector for host-process (gymnasium) environments.

The host analog of the jitted Collector: the policy's act function runs
jit-compiled on device over the batched observations while env stepping runs
in the host thread pool; collected segments are buffered as numpy on the
host and written to the device ring buffer in ONE ``add_trajectory`` call
per segment (amortizing host->device transfer, the role the reference's
shared-memory pipes + ``EnvPool`` play, SURVEY.md §2.1).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algos.base import Algorithm, TrainState
from tianshou_tpu.collect.collector import CollectStats
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.envs.host import HostVectorEnv

__all__ = ["HostCollector"]


class HostCollector:
    is_host_collector = True

    def __init__(
        self,
        algo: Algorithm,
        venv: HostVectorEnv,
        buffer: ReplayBuffer | None = None,
        reward_metric=None,
        act_on_host: bool | None = None,
    ):
        """``act_on_host``: run the policy's act function on the host CPU
        backend, syncing parameters from the accelerator ONCE per collect
        segment instead of paying a device round trip per env step.  This
        is the right mode whenever device->host latency dominates (remote/
        tunneled accelerators); acting params are one segment stale, the
        same staleness the pipelined trainer already accepts.  Default:
        auto — on when the default platform is not CPU.
        """
        self.algo = algo
        self.venv = venv
        self.buffer = buffer
        self.reward_metric = reward_metric
        self.obs: np.ndarray | None = None
        self.ep_ret = np.zeros(venv.num_envs)
        self.ep_len = np.zeros(venv.num_envs, np.int64)
        self._act_fns: dict = {}
        if act_on_host is None:
            act_on_host = jax.default_backend() != "cpu"
        try:
            self._cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            self._cpu = None
            act_on_host = False
        self.act_on_host = act_on_host
        # packed param-sync state (built lazily on the first segment)
        self._ts_host = None
        self._pack_fn = None
        self._unravel = None

    def _act_fn(self, explore: bool):
        if explore not in self._act_fns:
            algo = self.algo

            @partial(jax.jit, static_argnames=())
            def act(ts, obs, key, explore_param):
                a, extras = algo.act(ts, obs, key, explore, explore_param)
                return a, algo.map_action(a), extras

            self._act_fns[explore] = act
        return self._act_fns[explore]

    def _acting_state(self, ts: TrainState, key: jax.Array):
        """Place (ts, key) for acting: on the CPU backend when
        ``act_on_host``, unchanged otherwise.

        The accelerator->host hand-off is latency-bound (~25 ms per
        transfer over the tunnel), so when the algorithm exposes its
        minimal acting subtree (:meth:`Algorithm.act_params`) the sync is
        ONE packed transfer: a jitted device-side ``ravel_pytree`` of the
        acting params, one flat array across the link, an unravel on the
        host, grafted onto a host-resident skeleton pulled once.  Without
        ``act_params`` it falls back to the per-leaf full-state pull."""
        if not self.act_on_host:
            return ts, key, None
        key_cpu = jax.device_put(key, self._cpu)
        if self.algo.act_params(ts) is None:
            return jax.device_put(ts, self._cpu), key_cpu, self._cpu
        if self._ts_host is None:
            from jax.flatten_util import ravel_pytree

            self._ts_host = jax.device_put(ts, self._cpu)
            _, self._unravel = ravel_pytree(
                self.algo.act_params(self._ts_host)
            )
            self._pack_fn = jax.jit(
                lambda t: ravel_pytree(self.algo.act_params(t))[0]
            )
        flat = jax.device_put(self._pack_fn(ts), self._cpu)
        ts_cpu = self.algo.with_act_params(self._ts_host, self._unravel(flat))
        return ts_cpu, key_cpu, self._cpu

    def reset(self, seed: int = 0) -> None:
        self.obs = self.venv.reset(seed)
        self.ep_ret[:] = 0
        self.ep_len[:] = 0

    @staticmethod
    def _device_obs(obs, device=None):
        """Dict observations (MARL) become Batch pytrees on device."""
        if isinstance(obs, dict):
            b = Batch(obs).to_jax()
            return jax.device_put(b, device) if device is not None else b
        return (
            jax.device_put(np.asarray(obs), device)
            if device is not None
            else jnp.asarray(obs)
        )

    def _accumulate_rew(self, rew: np.ndarray) -> None:
        """Accumulate raw (possibly per-agent ``[N, A]``) rewards into the
        episode-return carry, lazily widening its shape on the first
        vector-valued reward."""
        rew = np.asarray(rew)
        if rew.shape != self.ep_ret.shape:
            self.ep_ret = np.zeros(rew.shape, self.ep_ret.dtype)
        self.ep_ret += rew

    def _episode_metric(self, ep_rew: np.ndarray) -> np.ndarray:
        """MARL ``reward_metric`` hook (reference ``trainer/base.py``):
        applied to accumulated per-agent *episode returns*
        ``[K, A] -> [K]`` at done boundaries (matching the reference's
        per-episode — not per-step — semantics, so non-linear metrics like
        min/max over agents are exact); the default tracks the first
        agent's column."""
        if self.reward_metric is not None:
            return np.asarray(self.reward_metric(ep_rew))
        return ep_rew if ep_rew.ndim == 1 else ep_rew[..., 0]

    # ------------------------------------------------------------------
    def collect(
        self,
        ts: TrainState,
        bstate: ReplayBufferState | None,
        num_steps: int,
        key: jax.Array,
        explore: bool = True,
        explore_param: float = 0.0,
        record_traj: bool = False,
        random: bool = False,
    ):
        """Collect ``num_steps`` steps per env.  Returns
        ``(bstate, stats, traj_or_None)``.

        ``random=True`` bypasses the policy and samples actions UNIFORMLY
        from the action space (the reference's ``collect(random=True)``
        warm-up, ``collector.py:266`` / ``mujoco_*.py start_timesteps``) —
        for deterministic actors this differs materially from acting with
        large exploration noise around an untrained policy."""
        assert self.obs is not None, "call reset() first"
        act_fn = self._act_fn(explore)
        rng = None
        if random:
            rng = np.random.default_rng(
                np.asarray(jax.random.key_data(key)).ravel()
            )
            space = self.algo.action_space
            from tianshou_tpu.envs.spaces import Box as _Box

            if isinstance(space, _Box):
                lo = np.asarray(space.low_arr())
                hi = np.asarray(space.high_arr())

                def sample_random(n):
                    # raw policy-space action in [-1, 1]; env action via
                    # the same affine map map_action applies
                    u = rng.uniform(-1.0, 1.0, (n,) + space.shape).astype(
                        np.float32
                    )
                    return u, lo + (u + 1.0) * 0.5 * (hi - lo)

            else:

                def sample_random(n):
                    a = rng.integers(0, space.n, (n,)).astype(np.int32)
                    return a, a
        # device->host transfers are the cost floor of the host loop (one
        # tunnel round trip each): with act_on_host, params sync to the CPU
        # backend ONCE per segment and per-step acting never touches the
        # accelerator; otherwise the only per-step fetch is the mapped env
        # action.  Raw actions and policy extras are stacked without
        # forcing transfers (the buffer they feed lives on device anyway).
        ts, key, act_dev = self._acting_state(ts, key)
        host_steps: list[Batch] = []
        dev_acts: list = []
        dev_extras: list = []
        returns, lens = [], []
        for t in range(num_steps):
            if random:
                raw_act, env_act_np = sample_random(self.venv.num_envs)
                extras = Batch()
            else:
                key, k_act = jax.random.split(key)
                raw_act, env_act, extras = act_fn(
                    ts, self._device_obs(self.obs, act_dev), k_act, explore_param
                )
                env_act_np = np.asarray(env_act)
            res, carry = self.venv.step(env_act_np)
            done = res.terminated | res.truncated
            self._accumulate_rew(res.reward)
            self.ep_len += 1
            host_steps.append(
                Batch(
                    obs=self.obs,
                    rew=res.reward,
                    terminated=res.terminated,
                    truncated=res.truncated,
                    obs_next=res.obs,
                )
            )
            dev_acts.append(raw_act)
            if not extras.is_empty():
                dev_extras.append(extras)
            if done.any():
                returns.extend(self._episode_metric(self.ep_ret[done]).tolist())
                lens.extend(self.ep_len[done].tolist())
                self.ep_ret[done] = 0
                self.ep_len[done] = 0
            self.obs = carry
        traj = Batch.stack(host_steps)  # [T, N, ...] numpy
        traj["act"] = jnp.stack(dev_acts)  # device stack, no fetch
        if dev_extras:
            traj["policy"] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *dev_extras
            )
        if self.buffer is not None and bstate is not None:
            # With act_on_host the act/policy leaves are COMMITTED to the
            # CPU backend (the act fn ran there).  An eager buffer write
            # mixing them with the uncommitted device storage would follow
            # the committed operand and silently migrate those storage
            # leaves to CPU — then the trainer's jitted update sees mixed
            # devices and fails.  Re-commit the whole segment to the
            # default device before the write (one batched transfer).
            traj_dev = traj.to_jax()
            if self.act_on_host:
                traj_dev = jax.device_put(traj_dev, jax.devices()[0])
            bstate = self.buffer.add_trajectory(bstate, traj_dev)
        stats = CollectStats(
            n_collected_steps=num_steps * self.venv.num_envs,
            n_collected_episodes=len(returns),
            returns=np.asarray(returns),
            lens=np.asarray(lens, np.int64),
        )
        return bstate, stats, (traj if record_traj else None)

    def collect_episodes(
        self,
        ts: TrainState,
        key: jax.Array,
        n_episode: int,
        explore: bool = False,
        explore_param: float = 0.0,
        max_steps: int = 100_000,
    ) -> CollectStats:
        """Collect exactly ``n_episode`` episodes with per-env quota
        fairness (``collector.py:606-624``)."""
        n = self.venv.num_envs
        quota = np.full(n, n_episode // n, np.int64)
        quota[: n_episode % n] += 1
        self.reset(seed=int(jax.random.randint(key, (), 0, 2**31 - 1)))
        act_fn = self._act_fn(explore)
        ts, key, act_dev = self._acting_state(ts, key)
        counts = np.zeros(n, np.int64)
        returns, lens = [], []
        for _ in range(max_steps):
            key, k_act = jax.random.split(key)
            _, env_act, _ = act_fn(
                ts, self._device_obs(self.obs, act_dev), k_act, explore_param
            )
            res, carry = self.venv.step(np.asarray(env_act))
            done = res.terminated | res.truncated
            self._accumulate_rew(res.reward)
            self.ep_len += 1
            for i in np.nonzero(done)[0]:
                if counts[i] < quota[i]:
                    returns.append(
                        float(self._episode_metric(self.ep_ret[i : i + 1])[0])
                    )
                    lens.append(int(self.ep_len[i]))
                counts[i] += 1
                self.ep_ret[i] = 0
                self.ep_len[i] = 0
            self.obs = carry
            if np.all(counts >= quota):
                break
        return CollectStats(
            n_collected_steps=int(np.sum(lens)),
            n_collected_episodes=len(returns),
            returns=np.asarray(returns),
            lens=np.asarray(lens, np.int64),
        )
