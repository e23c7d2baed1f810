"""Integration tests: each algorithm family trains to its reference
threshold (the reference's ``test/discrete`` + ``test/continuous`` pattern:
stop_fn hit == pass)."""

import jax
import pytest

from tianshou_tpu.algos.a2c import A2C
from tianshou_tpu.algos.ddpg import DDPG, TD3
from tianshou_tpu.algos.pg import PG
from tianshou_tpu.algos.ppo import PPO
from tianshou_tpu.algos.sac import SAC
from tianshou_tpu.collect.collector import Collector
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.envs.base import VectorEnv
from tianshou_tpu.envs.classic import CartPole, Pendulum
from tianshou_tpu.networks.common import QNet
from tianshou_tpu.networks.continuous import (
    CriticEnsemble,
    DeterministicActor,
    GaussianActor,
    ValueNet,
)
from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer
from tianshou_tpu.trainer.onpolicy import OnPolicyTrainer


def _run_onpolicy(algo, env, threshold, repeat, max_epoch=8, step_per_epoch=30000,
                  batch_size=256, seed=0):
    trainer = OnPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 16)),
        Collector(algo, VectorEnv(env, 16)),
        max_epoch=max_epoch,
        step_per_epoch=step_per_epoch,
        step_per_collect=2048,
        repeat_per_collect=repeat,
        batch_size=batch_size,
        episode_per_test=10,
        stop_fn=lambda rew: rew >= threshold,
        seed=seed,
    )
    info = trainer.run()
    assert info.stop_triggered, f"best={info.best_reward}"
    return info


def _run_offpolicy(algo, env, threshold, max_epoch=8):
    buffer = ReplayBuffer(capacity=2000, num_envs=10)
    trainer = OffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 10), buffer),
        Collector(algo, VectorEnv(env, 10)),
        buffer,
        max_epoch=max_epoch,
        step_per_epoch=6000,
        step_per_collect=100,
        update_per_step=0.125,
        batch_size=256,
        episode_per_test=10,
        stop_fn=lambda rew: rew >= threshold,
        warmup_steps=1000,
        seed=0,
    )
    info = trainer.run()
    assert info.stop_triggered, f"best={info.best_reward}"
    return info


def test_ppo_cartpole():
    env = CartPole()
    algo = PPO(
        QNet((64, 64), 2),
        ValueNet((64, 64)),
        env.action_space,
        lr=3e-4,
        gamma=0.99,
        gae_lambda=0.95,
        max_grad_norm=0.5,
        ent_coef=0.0,
    )
    _run_onpolicy(algo, env, 195, repeat=10)


def test_ppo_pendulum():
    env = Pendulum()
    algo = PPO(
        GaussianActor((64, 64), 1),
        ValueNet((64, 64)),
        env.action_space,
        lr=3e-4,
        gamma=0.95,
        gae_lambda=0.95,
        max_grad_norm=0.5,
        ent_coef=0.0,
    )
    _run_onpolicy(algo, env, -250, repeat=10)


def test_a2c_cartpole():
    env = CartPole()
    algo = A2C(
        QNet((64, 64), 2),
        ValueNet((64, 64)),
        env.action_space,
        lr=7e-4,
        gamma=0.99,
        gae_lambda=0.95,
        max_grad_norm=0.5,
    )
    _run_onpolicy(algo, env, 180, repeat=1)


def test_pg_cartpole():
    env = CartPole()
    algo = PG(QNet((64, 64), 2), env.action_space, lr=3e-4, ret_norm=True)
    _run_onpolicy(algo, env, 180, repeat=1, max_epoch=10)


def test_sac_pendulum():
    env = Pendulum()
    algo = SAC(
        actor=GaussianActor((128, 128), 1, conditioned_sigma=True),
        critic=CriticEnsemble((128, 128), num_critics=2),
        action_space=env.action_space,
        actor_lr=1e-3,
        critic_lr=1e-3,
        auto_alpha=True,
    )
    _run_offpolicy(algo, env, -250)


def test_td3_pendulum():
    env = Pendulum()
    algo = TD3(
        actor=DeterministicActor((128, 128), 1),
        critic=CriticEnsemble((128, 128), num_critics=2),
        action_space=env.action_space,
        actor_lr=1e-3,
        critic_lr=1e-3,
        exploration_noise=0.1,
    )
    _run_offpolicy(algo, env, -250)


def test_ddpg_pendulum():
    env = Pendulum()
    algo = DDPG(
        actor=DeterministicActor((128, 128), 1),
        critic=CriticEnsemble((128, 128), num_critics=1),
        action_space=env.action_space,
        actor_lr=1e-3,
        critic_lr=1e-3,
        exploration_noise=0.1,
    )
    _run_offpolicy(algo, env, -250)


def test_npg_pendulum():
    from tianshou_tpu.algos.npg import NPG

    env = Pendulum()
    algo = NPG(
        GaussianActor((64, 64), 1),
        ValueNet((64, 64)),
        env.action_space,
        critic_lr=1e-3,
        gamma=0.95,
        gae_lambda=0.95,
        optim_critic_iters=5,
        trust_region_size=0.3,
    )
    _run_onpolicy(algo, env, -250, repeat=2, max_epoch=10, batch_size=2048, seed=0)


def test_trpo_pendulum():
    from tianshou_tpu.algos.npg import TRPO

    env = Pendulum()
    algo = TRPO(
        GaussianActor((64, 64), 1),
        ValueNet((64, 64)),
        env.action_space,
        critic_lr=1e-3,
        gamma=0.95,
        gae_lambda=0.95,
        optim_critic_iters=5,
        # reference test config (test/continuous/test_trpo.py:50): under
        # the reference-exact running return normalization the smaller
        # trust region is what converges reliably
        max_kl=0.005,
        backtrack_coeff=0.8,
    )
    _run_onpolicy(algo, env, -250, repeat=2, max_epoch=25, batch_size=2048)
