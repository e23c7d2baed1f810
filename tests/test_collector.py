"""Collector tests with a deterministic corridor env asserting exact buffer
contents per step — the reference's ``test_collector.py:80-961`` strategy."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algos.base import Algorithm, RandomPolicy, TrainState
from tianshou_tpu.collect.collector import Collector
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.envs.base import VectorEnv
from tests.helpers import MoveToRight


class AlwaysRight(Algorithm):
    """Deterministic policy: always act=1."""

    def __init__(self, action_space):
        self.action_space = action_space

    def init(self, key, obs_example):
        return TrainState(params=(), opt_state=(), step=jnp.zeros((), jnp.int32))

    def act(self, ts, obs, key, explore, explore_param=0.0):
        leaves = jax.tree_util.tree_leaves(obs)
        bsz = leaves[0].shape[0]
        return jnp.ones((bsz,), jnp.int32), Batch()


def test_exact_buffer_contents():
    env = MoveToRight(size=3)
    venv = VectorEnv(env, num_envs=2)
    algo = AlwaysRight(env.action_space)
    buffer = ReplayBuffer(capacity=16, num_envs=2)
    col = Collector(algo, venv, buffer)

    cstate = col.reset(jax.random.key(0))
    ts = algo.init(jax.random.key(1), None)
    bstate = buffer.init(col.example_transition(ts, cstate))

    cstate, bstate, stats, _ = col.collect(ts, cstate, bstate, num_steps=7)

    # every env walks 0->1->2->3(terminate) then resets; episode length 3
    obs = np.asarray(bstate.storage["obs"])[:, :7, 0]
    expected = [0, 1, 2, 0, 1, 2, 0]
    for e in range(2):
        np.testing.assert_allclose(obs[e], expected)
    obs_next = np.asarray(bstate.storage["obs_next"])[:, :7, 0]
    np.testing.assert_allclose(obs_next[0], [1, 2, 3, 1, 2, 3, 1])
    term = np.asarray(bstate.storage["terminated"])[:, :7]
    np.testing.assert_array_equal(term[0], [0, 0, 1, 0, 0, 1, 0])
    rew = np.asarray(bstate.storage["rew"])[:, :7]
    np.testing.assert_allclose(rew[0], [0, 0, 1, 0, 0, 1, 0])

    # stats: 2 full episodes per env within 7 steps
    assert stats.n_collected_steps == 14
    assert stats.n_collected_episodes == 4
    assert np.allclose(stats.returns, 1.0)
    assert np.allclose(stats.lens, 3)


def test_collect_trajectory_mode():
    env = MoveToRight(size=2)
    venv = VectorEnv(env, num_envs=3)
    algo = AlwaysRight(env.action_space)
    col = Collector(algo, venv, buffer=None)
    cstate = col.reset(jax.random.key(0))
    ts = algo.init(jax.random.key(1), None)
    cstate, _, stats, traj = col.collect(
        ts, cstate, None, num_steps=4, record_traj=True
    )
    assert traj is not None
    assert np.asarray(traj["obs"]).shape == (4, 3, 1)
    np.testing.assert_allclose(
        np.asarray(traj["obs"])[:, 0, 0], [0, 1, 0, 1]
    )
    np.testing.assert_array_equal(
        np.asarray(traj["terminated"])[:, 0], [0, 1, 0, 1]
    )


def test_collect_episodes_quota_fairness():
    env = MoveToRight(size=3)
    venv = VectorEnv(env, num_envs=4)
    algo = AlwaysRight(env.action_space)
    col = Collector(algo, venv)
    ts = algo.init(jax.random.key(0), None)
    stats = col.collect_episodes(ts, jax.random.key(2), n_episode=7, chunk_size=8)
    assert stats.n_collected_episodes == 7
    assert np.allclose(stats.returns, 1.0)
    assert np.allclose(stats.lens, 3)


def test_random_policy_collect():
    env = MoveToRight(size=5, max_t=20)
    venv = VectorEnv(env, num_envs=2)
    algo = RandomPolicy(env.action_space)
    buffer = ReplayBuffer(capacity=64, num_envs=2)
    col = Collector(algo, venv, buffer)
    cstate = col.reset(jax.random.key(3))
    ts = algo.init(jax.random.key(4), None)
    bstate = buffer.init(col.example_transition(ts, cstate))
    cstate, bstate, stats, _ = col.collect(
        ts, cstate, bstate, num_steps=30, explore=True
    )
    acts = np.asarray(bstate.storage["act"])[:, :30]
    assert set(np.unique(acts)) <= {0, 1}
    assert 0 < acts.mean() < 1  # both actions taken
