"""Collector edge-case suite: autoreset obs-vs-carry exactness, policy
extras, recurrent-state resets at episode boundaries, pluggable MARL
reward metrics, and explore-flag plumbing (reference
``test/base/test_collector.py`` behaviors not covered by the exactness
test)."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algos.base import Algorithm, TrainState
from tianshou_tpu.collect.collector import Collector, rollout_segment
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.envs.base import JaxEnv, StepResult, VectorEnv
from tianshou_tpu.envs.spaces import Box, Discrete
from tests.helpers import MoveToRight


class AlwaysRight(Algorithm):
    def __init__(self, action_space, with_extras=False):
        self.action_space = action_space
        self.with_extras = with_extras

    def init(self, key, obs_example):
        return TrainState(params=(), opt_state=(), step=jnp.zeros((), jnp.int32))

    def act(self, ts, obs, key, explore, explore_param=0.0):
        bsz = jax.tree_util.tree_leaves(obs)[0].shape[0]
        a = jnp.ones((bsz,), jnp.int32)
        if self.with_extras:
            return a, Batch(log_prob=jnp.full((bsz,), -0.5))
        return a, Batch()


def _setup(algo, size=2, num_envs=2, capacity=16):
    env = MoveToRight(size=size)
    venv = VectorEnv(env, num_envs=num_envs)
    buffer = ReplayBuffer(capacity=capacity, num_envs=num_envs)
    col = Collector(algo, venv, buffer)
    cstate = col.reset(jax.random.key(0))
    ts = algo.init(jax.random.key(1), jax.tree.map(lambda x: x[0], cstate.obs))
    bstate = buffer.init(col.example_transition(ts, cstate))
    return env, venv, buffer, col, cstate, ts, bstate


def test_autoreset_stores_terminal_obs_next_and_carries_reset_obs():
    """At episode end the BUFFER must hold the terminal obs_next while the
    collector continues from the reset obs (reference collector.py:566-590
    auto-reset contract)."""
    algo = AlwaysRight(Discrete(2))
    env, venv, buffer, col, cstate, ts, bstate = _setup(algo, size=2)
    # corridor size 2: steps obs 0->1, 1->2(T), then reset obs 0 again
    cstate, bstate, stats, _ = col.collect(ts, cstate, bstate, 3)
    chron_obs = np.asarray(bstate.storage["obs"])[0, :3, 0]
    chron_next = np.asarray(bstate.storage["obs_next"])[0, :3, 0]
    term = np.asarray(bstate.storage["terminated"])[0, :3]
    np.testing.assert_array_equal(chron_obs, [0, 1, 0])  # restarted at 0
    np.testing.assert_array_equal(chron_next, [1, 2, 1])  # terminal 2 kept
    np.testing.assert_array_equal(term, [False, True, False])
    # collector's live obs continued from the reset episode
    assert float(np.asarray(cstate.obs)[0, 0]) == 1.0


def test_policy_extras_stored_in_buffer_and_traj():
    algo = AlwaysRight(Discrete(2), with_extras=True)
    env, venv, buffer, col, cstate, ts, bstate = _setup(algo)
    cstate, bstate, stats, traj = col.collect(
        ts, cstate, bstate, 4, record_traj=True
    )
    assert "policy" in bstate.storage.keys()
    np.testing.assert_allclose(
        np.asarray(bstate.storage["policy"]["log_prob"])[:, :4], -0.5
    )
    np.testing.assert_allclose(np.asarray(traj["policy"]["log_prob"]), -0.5)


class CountingState(Algorithm):
    """Recurrent policy whose state counts steps since episode start."""

    def __init__(self, action_space):
        self.action_space = action_space

    def init(self, key, obs_example):
        return TrainState(params=(), opt_state=(), step=jnp.zeros((), jnp.int32))

    def init_policy_state(self, num_envs):
        return jnp.zeros((num_envs,), jnp.int32)

    def act_with_state(self, ts, obs, pstate, key, explore, explore_param=0.0):
        bsz = jax.tree_util.tree_leaves(obs)[0].shape[0]
        return (
            jnp.ones((bsz,), jnp.int32),
            Batch(steps_in_ep=pstate),
            pstate + 1,
        )

    def act(self, ts, obs, key, explore, explore_param=0.0):
        # used only for schema probing (example_transition)
        bsz = jax.tree_util.tree_leaves(obs)[0].shape[0]
        return jnp.ones((bsz,), jnp.int32), Batch(
            steps_in_ep=jnp.zeros((bsz,), jnp.int32)
        )


def test_recurrent_state_resets_at_episode_boundary():
    """The carried policy state must reset to init on done (the reference's
    RecurrentStateBatch hidden-state reset, collector.py:400-443)."""
    algo = CountingState(Discrete(2))
    env, venv, buffer, col, cstate, ts, bstate = _setup(algo, size=2)
    # episodes are exactly 2 steps; over 6 steps the stored per-step
    # counter must cycle 0,1,0,1,0,1
    cstate, bstate, stats, traj = col.collect(
        ts, cstate, bstate, 6, record_traj=True
    )
    counters = np.asarray(traj["policy"]["steps_in_ep"])[:, 0]
    np.testing.assert_array_equal(counters, [0, 1, 0, 1, 0, 1])


class TwoAgentRewardEnv(JaxEnv):
    """Per-step vector reward [2] (MARL shape); episode of fixed length 3."""

    observation_space = Box(low=0.0, high=10.0, shape=(1,))
    action_space = Discrete(2)

    def reset(self, key):
        t = jnp.zeros((), jnp.int32)
        return t, jnp.zeros((1,), jnp.float32)

    def step(self, state, action):
        t = state + 1
        # agent rewards differ so min/max metrics discriminate
        rew = jnp.stack([jnp.float32(1.0), jnp.float32(3.0)])
        terminated = t >= 3
        return t, StepResult(
            t.astype(jnp.float32)[None], rew, terminated, jnp.zeros((), bool)
        )


def test_pluggable_reward_metric_applied_per_episode():
    """Non-linear (min over agents) metrics must act on ACCUMULATED episode
    returns, not per-step rewards (a37fa94 semantics fix): episode returns
    are [3, 9] per agent, so min yields 3.0 — a per-step min would give
    3 * min(1,3) = 3.0 too; use max to discriminate: max -> 9, per-step
    max would also give 9... use a metric where order matters:
    (ret[0] - ret[1])**2 -> (3-9)^2 = 36; per-step gives 3*(1-3)^2 = 12."""
    env = TwoAgentRewardEnv()
    venv = VectorEnv(env, num_envs=2)
    algo = AlwaysRight(Discrete(2))

    metric = lambda ep_ret: (ep_ret[..., 0] - ep_ret[..., 1]) ** 2
    seg = rollout_segment(
        algo, venv, None, 3, explore=False, record_traj=False,
        reward_metric=metric,
    )
    key = jax.random.key(0)
    cstate = Collector(algo, venv).reset(key)
    ts = algo.init(key, jax.tree.map(lambda x: x[0], cstate.obs))
    cstate, _, outputs = jax.jit(seg)(ts, cstate, None, 0.0)
    done = np.asarray(outputs["done"])
    rets = np.asarray(outputs["ep_ret"])
    assert done[2].all()  # 3-step episodes
    np.testing.assert_allclose(rets[2], 36.0)


def test_explore_flag_reaches_policy():
    calls = {}

    class Probe(Algorithm):
        def __init__(self):
            self.action_space = Discrete(2)

        def init(self, key, obs_example):
            return TrainState(params=(), opt_state=(), step=jnp.zeros((), jnp.int32))

        def act(self, ts, obs, key, explore, explore_param=0.0):
            calls["explore"] = explore
            bsz = jax.tree_util.tree_leaves(obs)[0].shape[0]
            return jnp.zeros((bsz,), jnp.int32), Batch()

    algo = Probe()
    env, venv, buffer, col, cstate, ts, bstate = _setup(algo)
    col.collect(ts, cstate, bstate, 1, explore=True)
    assert calls["explore"] is True
    col.collect(ts, cstate, bstate, 1, explore=False)
    assert calls["explore"] is False
