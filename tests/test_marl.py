"""Multi-agent tests: tic-tac-toe env semantics + self-play DQN via the
MultiAgentPolicyManager beating a random opponent (the reference's
``test/pettingzoo/tic_tac_toe.py`` analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.algos.base import RandomPolicy
from tianshou_tpu.algos.dqn import DQN
from tianshou_tpu.algos.multiagent import MultiAgentPolicyManager
from tianshou_tpu.collect.collector import Collector
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.envs.base import VectorEnv
from tianshou_tpu.envs.tictactoe import TicTacToe
from tianshou_tpu.networks.common import QNet
from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer


def test_tictactoe_env_semantics():
    env = TicTacToe()
    state, obs = env.reset(jax.random.key(0))
    assert int(obs["agent_id"]) == 0
    assert np.allclose(np.asarray(obs["mask"]), 1.0)
    # play a winning line for player 0: 0,3 / 1,4 / 2 -> win
    moves = [0, 3, 1, 4, 2]
    for i, m in enumerate(moves):
        state, res = env.step(state, jnp.asarray(m))
    assert bool(res.terminated)
    np.testing.assert_allclose(np.asarray(res.reward), [1.0, -1.0])
    # draw game: known sequence without three in a row
    state, obs = env.reset(jax.random.key(1))
    for m in [0, 4, 8, 1, 7, 6, 2, 5, 3]:
        state, res = env.step(state, jnp.asarray(m))
    assert bool(res.terminated)
    np.testing.assert_allclose(np.asarray(res.reward), [0.0, 0.0])
    # illegal move loses immediately
    state, obs = env.reset(jax.random.key(2))
    state, res = env.step(state, jnp.asarray(5))
    state, res = env.step(state, jnp.asarray(5))  # player 1 plays occupied
    assert bool(res.terminated)
    np.testing.assert_allclose(np.asarray(res.reward), [1.0, -1.0])


def test_selfplay_dqn_beats_random():
    env = TicTacToe()

    def make_dqn():
        return DQN(
            network=QNet((128, 128), 9),
            action_space=env.action_space,
            gamma=0.95,
            n_step=2,
            target_update_freq=320,
        )

    agents = [make_dqn(), make_dqn()]
    manager = MultiAgentPolicyManager(agents)
    buffer = ReplayBuffer(capacity=2000, num_envs=16)
    trainer = OffPolicyTrainer(
        manager,
        Collector(manager, VectorEnv(env, 16), buffer),
        Collector(manager, VectorEnv(env, 16)),
        buffer,
        max_epoch=3,
        step_per_epoch=15000,
        step_per_collect=160,
        update_per_step=0.1,
        batch_size=128,
        train_param_fn=lambda e, s: 0.2,
        warmup_steps=2000,
        seed=0,
    )
    info = trainer.run()

    # evaluate trained agent 0 vs a random opponent
    eval_manager = MultiAgentPolicyManager(
        [agents[0], RandomPolicy(env.action_space)]
    )
    rand_ts = RandomPolicy(env.action_space).init(jax.random.key(5), None)
    eval_ts = (trainer.train_state[0], rand_ts)
    col = Collector(eval_manager, VectorEnv(env, 16))
    stats = col.collect_episodes(eval_ts, jax.random.key(6), 64, chunk_size=16)
    mean_ret = stats.returns_mean  # +1 win / 0 draw / -1 loss for agent 0
    assert mean_ret > 0.5, f"agent0 vs random mean return {mean_ret}"


def test_pettingzoo_adapter_hosted():
    """PettingZoo tictactoe through the host bridge + manager (smoke)."""
    pz = pytest.importorskip("pettingzoo.classic")
    from pettingzoo.classic import tictactoe_v3

    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.envs.host import HostVectorEnv
    from tianshou_tpu.envs.pettingzoo_env import PettingZooEnv

    def make():
        return PettingZooEnv(tictactoe_v3.env())

    venv = HostVectorEnv([make for _ in range(4)])
    obs = venv.reset(seed=0)
    assert obs["obs"].shape == (4, 18)
    assert obs["mask"].shape == (4, 9)

    agents = [
        DQN(
            network=QNet((64, 64), 9),
            action_space=venv.action_space,
            gamma=0.95,
            n_step=2,
            target_update_freq=100,
        )
        for _ in range(2)
    ]
    manager = MultiAgentPolicyManager(agents)
    buffer = ReplayBuffer(capacity=500, num_envs=4)
    col = HostCollector(manager, venv, buffer)
    col.reset(seed=0)
    ts = manager.init(
        jax.random.key(0), jax.tree.map(lambda x: jnp.asarray(x[0]), obs)
    )
    _, stats, traj = col.collect(
        ts, None, 20, jax.random.key(1), explore=True, explore_param=0.5,
        record_traj=True,
    )
    assert np.asarray(traj["rew"]).shape == (20, 4, 2)
    assert np.asarray(traj["obs"]["mask"]).shape == (20, 4, 9)
    assert stats.n_collected_episodes > 0
    venv.close()
