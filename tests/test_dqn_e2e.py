"""End-to-end integration test: DQN reaches CartPole reward >= 195.

The analog of the reference's ``test/discrete/test_dqn.py`` threshold run —
full pipeline (jitted collector -> ring buffer -> fused update super-steps ->
test episodes) on the virtual CPU backend.
"""

import jax
import numpy as np

from tianshou_tpu.algos.dqn import DQN
from tianshou_tpu.collect.collector import Collector
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.envs.base import VectorEnv
from tianshou_tpu.envs.classic import CartPole
from tianshou_tpu.networks.common import QNet
from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer


def test_dqn_cartpole_reaches_threshold():
    env = CartPole()
    algo = DQN(
        network=QNet(hidden_sizes=(128, 128, 128), num_actions=2),
        action_space=env.action_space,
        lr=1e-3,
        gamma=0.9,
        n_step=3,
        target_update_freq=320,
    )
    buffer = ReplayBuffer(capacity=2000, num_envs=10)
    trainer = OffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 10), buffer),
        Collector(algo, VectorEnv(env, 10)),
        buffer,
        max_epoch=5,
        step_per_epoch=10000,
        step_per_collect=100,
        update_per_step=0.1,
        batch_size=64,
        episode_per_test=10,
        train_param_fn=lambda epoch, step: 0.1,
        test_param=0.0,
        stop_fn=lambda rew: rew >= 195,
        warmup_steps=1000,
        seed=0,
    )
    info = trainer.run()
    assert info.stop_triggered, f"did not reach 195, best={info.best_reward}"
    assert info.best_reward >= 195
