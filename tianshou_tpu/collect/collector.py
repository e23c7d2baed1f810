"""Jitted rollout engine: the TPU-native Collector.

Replaces the reference's Python hot loop ``Collector._collect``
(``tianshou/data/collector.py:446-653``): one step of
(policy act -> vmapped env step -> buffer write -> episode bookkeeping)
becomes the body of a ``lax.scan``, so an entire ``n_step`` collect segment is
a single XLA program with zero host round-trips.  Episode statistics are
emitted as fixed-shape per-step arrays (done flag + episode return/length at
done) and summarized host-side — the fixed-shape analog of the reference's
dynamic episode lists (``collector.py:566-624``).

``n_episode`` collection (used by the trainer's test phase,
``trainer/utils.py:17``) runs jitted fixed-size chunks under a host loop until
per-env episode quotas are met; only the first ``quota_i`` episodes of env i
count, reproducing the reference's surplus-env unbiasedness rule
(``collector.py:606-624``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tianshou_tpu.algos.base import Algorithm, TrainState
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.envs.base import VectorEnv

__all__ = ["CollectState", "CollectStats", "Collector", "rollout_segment"]


@struct.dataclass
class CollectState:
    """Carried collector state (the fixed-shape analog of the reference
    collector's mutable per-env attributes)."""

    env_state: Any
    obs: Any
    rng: jax.Array
    ep_ret: jax.Array  # [N] (or [N, n_agents] MARL) running episode return
    ep_len: jax.Array  # [N] running episode length
    policy_state: Any = ()  # per-env recurrent policy state (LSTM carries)


@dataclasses.dataclass
class CollectStats:
    """Host-side summary (reference ``CollectStats`` ``collector.py:46``)."""

    n_collected_steps: int
    n_collected_episodes: int
    returns: np.ndarray
    lens: np.ndarray

    @property
    def returns_mean(self) -> float:
        return float(self.returns.mean()) if self.returns.size else 0.0

    @property
    def returns_std(self) -> float:
        return float(self.returns.std()) if self.returns.size else 0.0

    @property
    def lens_mean(self) -> float:
        return float(self.lens.mean()) if self.lens.size else 0.0


def _default_reward_metric(ep_rew: jax.Array) -> jax.Array:
    """Scalarize per-agent episode returns [N, n_agents] -> [N] via the first
    agent's column (the reference's default when no ``reward_metric`` hook is
    given, ``trainer/base.py``)."""
    return ep_rew if ep_rew.ndim == 1 else ep_rew[..., 0]


def rollout_segment(
    algo: Algorithm,
    venv: VectorEnv,
    buffer: ReplayBuffer | None,
    num_steps: int,
    explore: bool,
    record_traj: bool,
    reward_metric=None,
):
    """Build the pure segment function
    ``(ts, cstate, bstate, explore_param) -> (cstate, bstate, outputs)``.

    ``outputs`` is a dict of time-major arrays; when ``record_traj`` it also
    holds the full ``[T, N, ...]`` transition trajectory (the on-policy path,
    replacing buffer round-trips entirely).

    ``reward_metric`` is the jittable analog of the reference's MARL
    ``reward_metric`` trainer hook: like the reference, it is applied to
    *accumulated per-agent episode returns* ``[N, n_agents] -> [N]`` at
    episode boundaries (not per step), so non-linear metrics (min/max over
    agents) match the reference's episode statistics.
    """
    reward_metric = reward_metric or _default_reward_metric

    def seg(ts: TrainState, cstate: CollectState, bstate, explore_param):
        def body(carry, _):
            cst, bst = carry
            k_act, k_env, rng = jax.random.split(cst.rng, 3)
            act, extras, pstate = algo.act_with_state(
                ts, cst.obs, cst.policy_state, k_act, explore, explore_param
            )
            env_act = algo.map_action(act)
            env_state, res, carry_obs = venv.step(cst.env_state, env_act, k_env)
            done = res.terminated | res.truncated
            # reset recurrent state on episode boundaries
            init_pstate = algo.init_policy_state(venv.num_envs)
            pstate = jax.tree.map(
                lambda i, p: jnp.where(
                    done.reshape(done.shape + (1,) * (jnp.ndim(p) - 1)), i, p
                ),
                init_pstate,
                pstate,
            )
            # ep_ret carries the reward's full (possibly per-agent) shape;
            # the metric scalarizes only finished episodes
            ep_ret = cst.ep_ret + res.reward
            ep_len = cst.ep_len + 1
            transition = Batch(
                obs=cst.obs,
                act=act,
                rew=res.reward,
                terminated=res.terminated,
                truncated=res.truncated,
                obs_next=res.obs,
            )
            if not extras.is_empty():
                transition["policy"] = extras
            if buffer is not None:
                bst = buffer.add(bst, transition)
            done_b = done.reshape(done.shape + (1,) * (ep_ret.ndim - done.ndim))
            out = {
                "done": done,
                "ep_ret": jnp.where(done, reward_metric(ep_ret), 0.0),
                "ep_len": jnp.where(done, ep_len, 0),
            }
            if record_traj:
                out["traj"] = transition
            new_cst = CollectState(
                env_state=env_state,
                obs=carry_obs,
                rng=rng,
                ep_ret=jnp.where(done_b, 0.0, ep_ret),
                ep_len=jnp.where(done, 0, ep_len),
                policy_state=pstate,
            )
            return (new_cst, bst), out

        (cstate, bstate), outputs = jax.lax.scan(
            body, (cstate, bstate), None, length=num_steps
        )
        return cstate, bstate, outputs

    return seg


class Collector:
    """Stateful convenience wrapper caching jitted segment functions.

    The analog of reference ``Collector`` (``data/collector.py:334``), with
    the data plane fully on device.
    """

    def __init__(
        self,
        algo: Algorithm,
        venv: VectorEnv,
        buffer: ReplayBuffer | None = None,
        reward_metric=None,
    ):
        self.algo = algo
        self.venv = venv
        self.buffer = buffer
        self.reward_metric = reward_metric
        self._jit_cache: dict = {}

    # -- state management --------------------------------------------------
    def _reward_shape(self, env_state, obs) -> tuple[int, ...]:
        """Probe the env's reward shape (``[N]`` single-agent, ``[N, A]``
        MARL) via ``jax.eval_shape`` — no compute, just shape inference —
        so the episode-return carry matches per-agent reward vectors."""
        from tianshou_tpu.envs.spaces import Box, MultiDiscrete

        n = self.venv.num_envs
        space = self.algo.action_space
        if isinstance(space, Box):
            act = jnp.zeros((n,) + space.shape, jnp.float32)
        elif isinstance(space, MultiDiscrete):
            act = jnp.zeros((n,) + space.shape, jnp.int32)
        else:
            act = jnp.zeros((n,), jnp.int32)
        try:
            res = jax.eval_shape(
                lambda s, a, k: self.venv.step(s, a, k)[1],
                env_state, self.algo.map_action(act), jax.random.key(0),
            )
            return tuple(res.reward.shape)
        except Exception:
            return (n,)

    def reset(self, key: jax.Array) -> CollectState:
        k_env, k_rng = jax.random.split(key)
        env_state, obs = self.venv.reset(k_env)
        n = self.venv.num_envs
        return CollectState(
            env_state=env_state,
            obs=obs,
            rng=k_rng,
            ep_ret=jnp.zeros(self._reward_shape(env_state, obs), jnp.float32),
            ep_len=jnp.zeros((n,), jnp.int32),
            policy_state=self.algo.init_policy_state(n),
        )

    def example_transition(self, ts: TrainState, cstate: CollectState) -> Batch:
        """One eager env step to derive the buffer schema (single-env leaves,
        no batch dims) — the analog of the reference's reserved-key ``_meta``
        pre-allocation (``buffer/base.py:33-43``)."""
        key = jax.random.key(0)
        act, extras = self.algo.act(ts, cstate.obs, key, False, 0.0)
        env_act = self.algo.map_action(act)
        _, res, _ = self.venv.step(cstate.env_state, env_act, key)
        tr = Batch(
            obs=cstate.obs,
            act=act,
            rew=res.reward,
            terminated=res.terminated,
            truncated=res.truncated,
            obs_next=res.obs,
        )
        if not extras.is_empty():
            tr["policy"] = extras
        return jax.tree.map(lambda x: x[0], tr)

    # -- segment collection --------------------------------------------------
    def _segment_fn(self, num_steps: int, explore: bool, record_traj: bool):
        k = (num_steps, explore, record_traj)
        if k not in self._jit_cache:
            seg = rollout_segment(
                self.algo, self.venv, self.buffer, num_steps, explore,
                record_traj, self.reward_metric,
            )
            self._jit_cache[k] = jax.jit(seg)
        return self._jit_cache[k]

    def collect(
        self,
        ts: TrainState,
        cstate: CollectState,
        bstate: ReplayBufferState | None,
        num_steps: int,
        explore: bool = True,
        explore_param: float = 0.0,
        record_traj: bool = False,
    ):
        """Collect ``num_steps`` steps per env.  Returns
        ``(cstate, bstate, stats, traj_or_None)``."""
        seg = self._segment_fn(num_steps, explore, record_traj)
        cstate, bstate, outputs = seg(ts, cstate, bstate, explore_param)
        stats = self.summarize(outputs, self.venv.num_envs * num_steps)
        traj = outputs.get("traj") if record_traj else None
        return cstate, bstate, stats, traj

    @staticmethod
    def summarize(outputs: dict, n_steps: int) -> CollectStats:
        done = np.asarray(outputs["done"])
        rets = np.asarray(outputs["ep_ret"])
        lens = np.asarray(outputs["ep_len"])
        mask = done.astype(bool)
        return CollectStats(
            n_collected_steps=n_steps,
            n_collected_episodes=int(mask.sum()),
            returns=rets[mask],
            lens=lens[mask],
        )

    # -- episode-mode collection ---------------------------------------------
    def collect_episodes(
        self,
        ts: TrainState,
        key: jax.Array,
        n_episode: int,
        chunk_size: int = 128,
        explore: bool = False,
        explore_param: float = 0.0,
        max_chunks: int = 1000,
    ) -> CollectStats:
        """Collect exactly ``n_episode`` episodes from freshly reset envs.

        Quota fairness: env ``i`` contributes ``n//N + (i < n%N)`` episodes
        and any surplus episodes are discarded, matching the reference's
        surplus-env masking (``collector.py:606-624``).
        """
        n = self.venv.num_envs
        quota = np.full(n, n_episode // n, np.int64)
        quota[: n_episode % n] += 1
        cstate = self.reset(key)
        seg = self._segment_fn(chunk_size, explore, False)
        per_env_returns: list[list[float]] = [[] for _ in range(n)]
        per_env_lens: list[list[int]] = [[] for _ in range(n)]
        counts = np.zeros(n, np.int64)
        for _ in range(max_chunks):
            cstate, _, outputs = seg(ts, cstate, None, explore_param)
            done = np.asarray(outputs["done"])
            rets = np.asarray(outputs["ep_ret"])
            lens = np.asarray(outputs["ep_len"])
            for t, i in zip(*np.nonzero(done)):
                if counts[i] < quota[i]:
                    per_env_returns[i].append(float(rets[t, i]))
                    per_env_lens[i].append(int(lens[t, i]))
                counts[i] += 1
            if np.all(counts >= quota):
                break
        returns = np.asarray(
            [r for lst in per_env_returns for r in lst], np.float64
        )
        lens_arr = np.asarray([l for lst in per_env_lens for l in lst], np.int64)
        return CollectStats(
            n_collected_steps=int(lens_arr.sum()),
            n_collected_episodes=int(returns.size),
            returns=returns,
            lens=lens_arr,
        )
