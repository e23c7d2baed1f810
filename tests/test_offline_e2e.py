"""Offline-RL integration tests (the reference's ``test/offline/*`` analogs):
expert data is generated on the fly (``gather_pendulum_data.py`` /
``gather_cartpole_data.py`` pattern), saved+loaded through HDF5, then each
offline algorithm trains from the static buffer to a threshold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.algos.dqn import DQN
from tianshou_tpu.algos.offline import (
    BC,
    BCQ,
    CQL,
    TD3BC,
    DiscreteBCQ,
    DiscreteCQL,
    DiscreteCRR,
)
from tianshou_tpu.algos.sac import SAC
from tianshou_tpu.collect.collector import Collector
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.data.persistence import load_buffer_hdf5, save_buffer_hdf5
from tianshou_tpu.envs.base import VectorEnv
from tianshou_tpu.envs.classic import CartPole, Pendulum
from tianshou_tpu.networks.common import QNet, QNetEnsemble
from tianshou_tpu.networks.continuous import (
    Critic,
    CriticEnsemble,
    DeterministicActor,
    GaussianActor,
    Perturbation,
    VAE,
)
from tianshou_tpu.networks.discrete import QRDQNNet
from tianshou_tpu.trainer.offline import OfflineTrainer
from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer


@pytest.fixture(scope="module")
def pendulum_data(tmp_path_factory):
    """Train SAC to threshold, then collect 24k transitions (with
    exploration) as the offline dataset; round-trip through HDF5."""
    env = Pendulum()
    algo = SAC(
        actor=GaussianActor((128, 128), 1, conditioned_sigma=True),
        critic=CriticEnsemble((128, 128), num_critics=2),
        action_space=env.action_space,
        auto_alpha=True,
    )
    buffer = ReplayBuffer(capacity=2400, num_envs=10)
    trainer = OffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 10), buffer),
        Collector(algo, VectorEnv(env, 10)),
        buffer,
        max_epoch=8,
        step_per_epoch=6000,
        step_per_collect=100,
        update_per_step=0.125,
        batch_size=256,
        stop_fn=lambda rew: rew >= -250,
        warmup_steps=1000,
        seed=1,
    )
    info = trainer.run()
    assert info.stop_triggered
    # fill the buffer with (stochastic) expert rollouts
    col = Collector(algo, VectorEnv(env, 10), buffer)
    cstate = col.reset(jax.random.key(7))
    _, bstate, _, _ = col.collect(
        trainer.train_state, cstate, trainer.buffer_state, num_steps=240,
        explore=True,
    )
    path = str(tmp_path_factory.mktemp("data") / "pendulum.h5")
    save_buffer_hdf5(path, bstate)
    return buffer, load_buffer_hdf5(path)


@pytest.fixture(scope="module")
def cartpole_data(tmp_path_factory):
    env = CartPole()
    algo = DQN(
        network=QNet((128, 128, 128), 2),
        action_space=env.action_space,
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
        train_param_fn=lambda e, s: 0.1,
        stop_fn=lambda rew: rew >= 195,
        warmup_steps=1000,
        seed=0,
    )
    info = trainer.run()
    assert info.stop_triggered
    col = Collector(algo, VectorEnv(env, 10), buffer)
    cstate = col.reset(jax.random.key(9))
    _, bstate, _, _ = col.collect(
        trainer.train_state, cstate, trainer.buffer_state, num_steps=200,
        explore=True, explore_param=0.1,
    )
    return buffer, bstate


def _run_offline(algo, buffer, bstate, env, threshold, max_epoch=6,
                 update_per_epoch=2000, batch_size=256):
    trainer = OfflineTrainer(
        algo,
        buffer,
        bstate,
        Collector(algo, VectorEnv(env, 10)),
        max_epoch=max_epoch,
        update_per_epoch=update_per_epoch,
        batch_size=batch_size,
        episode_per_test=10,
        stop_fn=lambda rew: rew >= threshold,
        seed=0,
    )
    info = trainer.run()
    assert info.best_reward >= threshold, f"best={info.best_reward}"
    return info


def test_bc_pendulum(pendulum_data):
    buffer, bstate = pendulum_data
    env = Pendulum()
    algo = BC(
        DeterministicActor((128, 128), 1), env.action_space, lr=1e-3
    )
    _run_offline(algo, buffer, bstate, env, -600)


def test_td3_bc_pendulum(pendulum_data):
    buffer, bstate = pendulum_data
    env = Pendulum()
    algo = TD3BC(
        actor=DeterministicActor((128, 128), 1),
        critic=CriticEnsemble((128, 128), num_critics=2),
        action_space=env.action_space,
        bc_alpha=2.5,
        gamma=0.99,
    )
    _run_offline(algo, buffer, bstate, env, -600)


def test_cql_pendulum(pendulum_data):
    buffer, bstate = pendulum_data
    env = Pendulum()
    algo = CQL(
        actor=GaussianActor((128, 128), 1, conditioned_sigma=True),
        critic=CriticEnsemble((128, 128), num_critics=2),
        action_space=env.action_space,
        cql_weight=1.0,
        num_repeat_actions=10,
    )
    _run_offline(algo, buffer, bstate, env, -600, update_per_epoch=1000)


def test_bcq_pendulum(pendulum_data):
    buffer, bstate = pendulum_data
    env = Pendulum()
    algo = BCQ(
        perturbation=Perturbation((128, 128), 1, phi=0.05),
        critic=CriticEnsemble((128, 128), num_critics=2),
        vae=VAE((128, 128), action_dim=1, latent_dim=2),
        action_space=env.action_space,
    )
    _run_offline(algo, buffer, bstate, env, -600)


def test_discrete_bcq_cartpole(cartpole_data):
    buffer, bstate = cartpole_data
    env = CartPole()
    algo = DiscreteBCQ(
        q_network=QNet((128, 128), 2),
        imitation_network=QNet((128, 128), 2),
        action_space=env.action_space,
        target_update_freq=500,
        unlikely_action_threshold=0.3,
    )
    _run_offline(algo, buffer, bstate, env, 120, batch_size=64)


def test_discrete_cql_cartpole(cartpole_data):
    buffer, bstate = cartpole_data
    env = CartPole()
    algo = DiscreteCQL(
        QRDQNNet((128, 128), 2, num_quantiles=32),
        env.action_space,
        num_quantiles=32,
        min_q_weight=10.0,
        gamma=0.95,
        n_step=3,
        target_update_freq=320,
    )
    _run_offline(algo, buffer, bstate, env, 120, batch_size=64)


def test_discrete_crr_cartpole(cartpole_data):
    buffer, bstate = cartpole_data
    env = CartPole()
    algo = DiscreteCRR(
        actor=QNet((128, 128), 2),
        critic=QNet((128, 128), 2),
        action_space=env.action_space,
        policy_improvement_mode="exp",
        target_update_freq=500,
    )
    _run_offline(algo, buffer, bstate, env, 120, batch_size=64)


def test_gail_pendulum(pendulum_data):
    from tianshou_tpu.algos.gail import GAIL
    from tianshou_tpu.networks.continuous import ValueNet
    from tianshou_tpu.trainer.onpolicy import OnPolicyTrainer

    buffer, bstate = pendulum_data
    env = Pendulum()
    algo = GAIL(
        GaussianActor((64, 64), 1),
        ValueNet((64, 64)),
        env.action_space,
        disc_net=Critic((64, 64)),
        expert_buffer=buffer,
        expert_buffer_state=bstate,
        disc_lr=2.5e-4,
        disc_update_num=2,
        lr=3e-4,
        gamma=0.95,
        gae_lambda=0.95,
        max_grad_norm=0.5,
        ent_coef=0.0,
    )
    trainer = OnPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 16)),
        Collector(algo, VectorEnv(env, 16)),
        max_epoch=10,
        step_per_epoch=30000,
        step_per_collect=2048,
        repeat_per_collect=10,
        batch_size=256,
        episode_per_test=10,
        stop_fn=lambda rew: rew >= -500,
        seed=0,
    )
    info = trainer.run()
    assert info.stop_triggered, f"best={info.best_reward}"


def test_cql_lagrange_dual_dynamics(pendulum_data):
    """CQL(Lagrange) (reference cql.py:361-373): the dual variable must
    RISE while the conservative penalty exceeds the threshold (pushing the
    critic down harder) and updates must run end to end."""
    import jax
    import jax.numpy as jnp

    buffer, bstate = pendulum_data
    env = Pendulum()
    algo = CQL(
        actor=GaussianActor((64, 64), 1, conditioned_sigma=True),
        critic=CriticEnsemble((64, 64), num_critics=2),
        action_space=env.action_space,
        cql_weight=1.0,
        num_repeat_actions=5,
        with_lagrange=True,
        lagrange_threshold=-1e6,  # penalty always above -> dual must grow
        cql_alpha_lr=1e-2,
    )
    key = jax.random.key(0)
    example = buffer.get(bstate, jnp.asarray([0]), jnp.asarray([0]))
    ts = algo.init(key, jnp.asarray(example["obs"][0]))
    la0 = float(ts.cql_log_alpha)
    for i in range(5):
        key, k = jax.random.split(key)
        ts, bstate, metrics = algo.update(ts, buffer, bstate, k, 64)
    assert float(ts.cql_log_alpha) > la0
    assert "cql_alpha" in metrics
    # and with a huge threshold the dual must shrink instead
    algo2 = CQL(
        actor=GaussianActor((64, 64), 1, conditioned_sigma=True),
        critic=CriticEnsemble((64, 64), num_critics=2),
        action_space=env.action_space,
        with_lagrange=True,
        lagrange_threshold=1e6,
        cql_alpha_lr=1e-2,
        num_repeat_actions=5,
    )
    ts2 = algo2.init(key, jnp.asarray(example["obs"][0]))
    for i in range(5):
        key, k = jax.random.split(key)
        ts2, bstate, _ = algo2.update(ts2, buffer, bstate, k, 64)
    assert float(ts2.cql_log_alpha) < la0


def test_calql_calibration_returns_and_clamping(pendulum_data):
    """CalQL (reference cql.py:214-233,323-338): prepare_offline must store
    exact Monte-Carlo returns per ring slot, and calibrated updates run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    buffer, bstate = pendulum_data
    env = Pendulum()
    algo = CQL(
        actor=GaussianActor((64, 64), 1, conditioned_sigma=True),
        critic=CriticEnsemble((64, 64), num_critics=2),
        action_space=env.action_space,
        calibrated=True,
        num_repeat_actions=5,
        gamma=0.9,
    )
    bstate2 = algo.prepare_offline(buffer, bstate)
    assert "calibration_return" in bstate2.storage.keys()
    # oracle: reward-to-go with gamma within each episode, per env ring
    rew = np.asarray(bstate.storage["rew"])
    done = np.asarray(bstate.storage["terminated"]) | np.asarray(
        bstate.storage["truncated"]
    )
    cal = np.asarray(bstate2.storage["calibration_return"])
    N, T = rew.shape
    size = np.asarray(bstate.size)
    cursor = np.asarray(bstate.cursor)
    for n in range(N):
        # age order positions
        start = (cursor[n] - size[n]) % T
        order = [(start + t) % T for t in range(size[n])]
        ret = 0.0
        expected = {}
        for p in reversed(order):
            if done[n, p]:
                ret = 0.0
            ret = rew[n, p] + 0.9 * ret
            expected[p] = ret
        for p, want in expected.items():
            np.testing.assert_allclose(cal[n, p], want, rtol=1e-5)
    # one calibrated update step runs end to end
    key = jax.random.key(0)
    example = buffer.get(bstate2, jnp.asarray([0]), jnp.asarray([0]))
    ts = algo.init(key, jnp.asarray(example["obs"][0]))
    ts, bstate2, metrics = algo.update(ts, buffer, bstate2, key, 32)
    assert np.isfinite(float(metrics["critic_loss"]))
