"""Finite-env / dataset-epoch pattern: every episode of a fixed dataset is
consumed exactly once per pass (reference ``test/base/test_env_finite.py``,
issue #322 semantics)."""

from collections import Counter

import jax
import numpy as np

from tianshou_tpu.algos.base import RandomPolicy
from tianshou_tpu.envs.finite import FiniteHostVectorEnv, collect_dataset_episodes
from tianshou_tpu.envs.spaces import Box, Discrete


class _DatasetEnv:
    """Serves a shard of (sample_id, episode_len) pairs; reset() returns
    (None, {}) when the shard is exhausted — the finite-env contract."""

    class _Sp:
        pass

    def __init__(self, shard):
        self.shard = list(shard)
        self.it = None
        self.observation_space = Box(low=-1.0, high=1e9, shape=(2,))
        self.action_space = Discrete(2)
        self.consumed = Counter()

    def reset(self, seed=None, options=None):
        if self.it is None:
            self.it = iter(self.shard)
        try:
            self.sample_id, self.ep_len = next(self.it)
            self.t = 0
            return np.asarray([self.sample_id, self.t], np.float32), {}
        except StopIteration:
            self.it = None
            return None, {}

    def step(self, action):
        self.t += 1
        assert self.t <= self.ep_len
        done = self.t >= self.ep_len
        if done:
            self.consumed[self.sample_id] += 1
        return (
            np.asarray([self.sample_id, self.t], np.float32),
            1.0,
            done,
            False,
            {},
        )

    def close(self):
        pass


def _make_sharded(length=25, num_envs=4):
    episodes = [(i, 3 * i % 5 + 1) for i in range(length)]
    shards = [episodes[r::num_envs] for r in range(num_envs)]
    envs = [_DatasetEnv(s) for s in shards]
    venv = FiniteHostVectorEnv([lambda e=e: e for e in envs])
    return venv, envs, episodes


def test_one_pass_consumes_every_episode_exactly_once():
    venv, envs, episodes = _make_sharded()
    algo = RandomPolicy(Discrete(2))
    ts = algo.init(jax.random.key(0), np.zeros(2, np.float32))
    returns, lens = collect_dataset_episodes(algo, ts, venv, jax.random.key(1))
    assert venv.exhausted
    consumed = Counter()
    for e in envs:
        consumed.update(e.consumed)
    assert set(consumed) == {i for i, _ in episodes}
    assert all(c == 1 for c in consumed.values()), consumed
    # rewards are 1/step, so returns == lens == the dataset's episode lengths
    assert sorted(lens.tolist()) == sorted(l for _, l in episodes)
    np.testing.assert_array_equal(returns, lens.astype(float))


def test_dead_envs_do_not_pollute_metrics():
    """Shards of very different sizes: the long shard keeps stepping after
    the short ones die; dead envs must contribute zero episodes."""
    episodes = [(i, 2) for i in range(9)]  # 9 episodes of length 2
    shards = [episodes[:7], episodes[7:8], episodes[8:9], []]
    # the empty shard is dead from the first reset
    envs = [_DatasetEnv(s) for s in shards]
    venv = FiniteHostVectorEnv([lambda e=e: e for e in envs])
    algo = RandomPolicy(Discrete(2))
    ts = algo.init(jax.random.key(0), np.zeros(2, np.float32))
    returns, lens = collect_dataset_episodes(algo, ts, venv, jax.random.key(1))
    assert len(returns) == 9
    np.testing.assert_array_equal(lens, np.full(9, 2))


def test_second_pass_restarts_the_dataset():
    venv, envs, episodes = _make_sharded(length=8, num_envs=2)
    algo = RandomPolicy(Discrete(2))
    ts = algo.init(jax.random.key(0), np.zeros(2, np.float32))
    for _ in range(2):
        collect_dataset_episodes(algo, ts, venv, jax.random.key(1))
        assert venv.exhausted
    consumed = Counter()
    for e in envs:
        consumed.update(e.consumed)
    assert all(c == 2 for c in consumed.values()), consumed
