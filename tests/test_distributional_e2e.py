"""Distributional DQN family integration tests (the reference's
``test/discrete/test_{c51,qrdqn,iqn,fqf,rainbow,bdq}.py`` analogs) plus
unit checks for the projection / quantile-Huber kernels."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algos.bdq import BDQ
from tianshou_tpu.algos.c51 import C51, Rainbow
from tianshou_tpu.algos.qrdqn import FQF, IQN, QRDQN, quantile_huber_loss
from tianshou_tpu.collect.collector import Collector
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.envs.base import VectorEnv
from tianshou_tpu.envs.classic import CartPole, Pendulum
from tianshou_tpu.envs.wrappers import ContinuousToDiscrete
from tianshou_tpu.networks.common import BranchingQNet
from tianshou_tpu.networks.discrete import (
    C51Net,
    FractionProposalNetwork,
    FullQuantileFunction,
    ImplicitQuantileNetwork,
    QRDQNNet,
)
from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer


def _train(algo, env, threshold, num_envs=10, max_epoch=4, step_per_epoch=8000):
    buffer = ReplayBuffer(capacity=2000, num_envs=num_envs)
    trainer = OffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, num_envs), buffer),
        Collector(algo, VectorEnv(env, num_envs)),
        buffer,
        max_epoch=max_epoch,
        step_per_epoch=step_per_epoch,
        step_per_collect=num_envs * 10,
        update_per_step=0.1,
        batch_size=64,
        train_param_fn=lambda e, s: 0.1,
        stop_fn=lambda rew: rew >= threshold,
        warmup_steps=1000,
        seed=2,
    )
    info = trainer.run()
    assert info.stop_triggered, f"best={info.best_reward}"
    return info


def test_quantile_huber_loss_properties():
    # K=1: identical single quantile -> zero loss; unit offset -> |td| = 1
    cur = jnp.asarray([[0.5], [-1.0]])
    tau = jnp.full((2, 1), 0.5)
    loss_self, _ = quantile_huber_loss(cur, cur, tau)
    np.testing.assert_allclose(np.asarray(loss_self), 0.0, atol=1e-6)
    loss_off, td = quantile_huber_loss(cur, cur + 1.0, tau)
    assert np.all(np.asarray(loss_off) > 0)
    np.testing.assert_allclose(np.asarray(td), 1.0, atol=1e-6)
    # asymmetry: for tau near 1 underestimation costs more than over-
    tau_hi = jnp.full((1, 1), 0.9)
    under, _ = quantile_huber_loss(jnp.zeros((1, 1)), jnp.ones((1, 1)), tau_hi)
    over, _ = quantile_huber_loss(jnp.zeros((1, 1)), -jnp.ones((1, 1)), tau_hi)
    assert float(under[0]) > float(over[0])


def test_c51_projection_identity():
    """Projecting the support onto itself (gamma-free) is the identity."""
    algo = C51(
        C51Net((32,), 2, num_atoms=11),
        CartPole().action_space,
        num_atoms=11,
        v_min=-5,
        v_max=5,
    )
    B = 4
    probs = jax.nn.softmax(
        jnp.asarray(np.random.default_rng(1).normal(size=(B, 11))), axis=-1
    )
    m = algo._project(
        probs,
        returns=jnp.zeros(B),
        discount=jnp.ones(B),
        mask=jnp.ones(B),
    )
    np.testing.assert_allclose(np.asarray(m), np.asarray(probs), atol=1e-6)
    # terminated: all mass collapses onto the atom nearest `returns`
    m2 = algo._project(
        probs, returns=jnp.full(B, 2.0), discount=jnp.ones(B), mask=jnp.zeros(B)
    )
    np.testing.assert_allclose(np.asarray(m2).sum(-1), 1.0, atol=1e-6)
    assert np.allclose(np.asarray(m2)[:, 7], 1.0)  # atom at +2


def test_c51_cartpole():
    env = CartPole()
    algo = C51(
        C51Net((128, 128), 2, num_atoms=51),
        env.action_space,
        num_atoms=51,
        v_min=0.0,
        v_max=200.0,
        gamma=0.95,
        n_step=3,
        target_update_freq=320,
    )
    _train(algo, env, 180)


def test_rainbow_cartpole():
    env = CartPole()
    algo = Rainbow(
        C51Net((128, 128), 2, num_atoms=51, noisy=True),
        env.action_space,
        num_atoms=51,
        v_min=0.0,
        v_max=200.0,
        gamma=0.95,
        n_step=3,
        target_update_freq=320,
    )
    _train(algo, env, 180)


def test_qrdqn_cartpole():
    env = CartPole()
    algo = QRDQN(
        QRDQNNet((128, 128), 2, num_quantiles=64),
        env.action_space,
        num_quantiles=64,
        gamma=0.95,
        n_step=3,
        target_update_freq=320,
    )
    _train(algo, env, 180)


def test_iqn_cartpole():
    env = CartPole()
    algo = IQN(
        ImplicitQuantileNetwork((128, 128), 2),
        env.action_space,
        sample_size=32,
        online_sample_size=8,
        target_sample_size=8,
        gamma=0.95,
        n_step=3,
        target_update_freq=320,
    )
    _train(algo, env, 180)


def test_fqf_cartpole():
    env = CartPole()
    algo = FQF(
        FullQuantileFunction((128, 128), 2),
        FractionProposalNetwork(num_fractions=32),
        env.action_space,
        num_fractions=32,
        fraction_lr=2.5e-9,
        lr=3e-3,
        gamma=0.95,
        n_step=3,
        target_update_freq=320,
    )
    _train(algo, env, 180, max_epoch=8)


def test_bdq_discretized_pendulum():
    env = ContinuousToDiscrete(Pendulum(), action_per_dim=11, force_multidiscrete=True)
    algo = BDQ(
        BranchingQNet((128, 128), num_branches=1, actions_per_branch=11),
        env.action_space,
        gamma=0.99,
        target_update_freq=320,
    )
    buffer = ReplayBuffer(capacity=2000, num_envs=10)
    trainer = OffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 10), buffer),
        Collector(algo, VectorEnv(env, 10)),
        buffer,
        max_epoch=5,
        step_per_epoch=6000,
        step_per_collect=100,
        update_per_step=0.1,
        batch_size=128,
        train_param_fn=lambda e, s: 0.1,
        stop_fn=lambda rew: rew >= -300,
        warmup_steps=1000,
        seed=0,
    )
    info = trainer.run()
    assert info.stop_triggered, f"best={info.best_reward}"


def test_drqn_cartpole():
    """Recurrent DQN with LSTM carries through the collector scan
    (reference ``test/discrete/test_drqn.py`` analog)."""
    from tianshou_tpu.algos.drqn import DRQN
    from tianshou_tpu.networks.common import RecurrentQNet

    env = CartPole()
    algo = DRQN(
        RecurrentQNet(hidden_size=128, num_actions=2),
        env.action_space,
        stack_num=4,
        gamma=0.95,
        target_update_freq=320,
    )
    _train(algo, env, 180, max_epoch=12)
