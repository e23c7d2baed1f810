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


def test_finite_eval_collector_through_trainer_epochs():
    """FiniteHostVectorEnv drives a TRAINER's per-epoch test phase
    (``FiniteEvalCollector``): DQN trains on host CartPole while each
    epoch's evaluation is one exactly-once pass over a fixed episode
    dataset — the reference finite-env pattern inside a real training
    loop."""
    import gymnasium as gym

    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.finite import FiniteEvalCollector
    from tianshou_tpu.envs.host import HostVectorEnv
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    venv, envs, episodes = _make_sharded(length=17, num_envs=4)
    # obs dim of the dataset env is 2; train on a matching fake env? No —
    # train on the SAME dataset-env family so shapes agree: use a fresh
    # infinite variant for training (cycled shards).
    class _Cycling(_DatasetEnv):
        def reset(self, seed=None, options=None):
            obs, info = super().reset(seed, options)
            if obs is None:  # restart the shard: infinite stream for train
                return super().reset(seed, options)
            return obs, info

    train_envs = [_Cycling([(i, 4)] * 50) for i in range(4)]
    train_venv = HostVectorEnv([lambda e=e: e for e in train_envs])
    algo = DQN(
        network=QNet((16,), 2), action_space=envs[0].action_space,
        lr=1e-3, gamma=0.9, n_step=1, target_update_freq=50,
    )
    buffer = ReplayBuffer(capacity=200, num_envs=4)
    trainer = OffPolicyTrainer(
        algo,
        HostCollector(algo, train_venv, buffer),
        FiniteEvalCollector(algo, venv),
        buffer,
        max_epoch=2,
        step_per_epoch=64,
        step_per_collect=16,
        update_per_step=0.25,
        batch_size=16,
        episode_per_test=999,  # ignored by the finite adapter
        warmup_steps=32,
        seed=0,
    )
    info = trainer.run()
    assert info.epoch == 2
    # each epoch ran one full pass: every episode consumed exactly twice
    for env in envs:
        for sample_id, _ in env.shard:
            assert env.consumed[sample_id] == 2, (sample_id, env.consumed)
    # reward per episode == its length (reward 1 per step): the reported
    # best must equal the dataset's mean episode length
    mean_len = float(np.mean([l for _, l in episodes]))
    assert abs(info.best_reward - mean_len) < 1e-6
