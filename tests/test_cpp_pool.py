"""Native C++ env pool tests: dynamics parity with the JAX envs, auto-reset
semantics, and DQN learning through the pool (EnvPool-analog validation)."""

import numpy as np
import pytest

from tianshou_tpu.envs.cpp_pool import CppVectorEnv


def test_build_and_basic_semantics():
    env = CppVectorEnv("CartPole-v1", 8, seed=3)
    obs = env.reset()
    assert obs.shape == (8, 4)
    assert np.all(np.abs(obs) <= 0.05)
    res, carry = env.step(np.ones(8, np.float32))
    assert res.obs.shape == (8, 4)
    assert np.allclose(res.reward, 1.0)
    env.close()


def test_cartpole_dynamics_match_jax_env():
    """Identical state + action => identical next state (same physics)."""
    import jax
    import jax.numpy as jnp

    from tianshou_tpu.envs.classic import CartPole, CartPoleState

    cpp = CppVectorEnv("CartPole-v1", 4, seed=7)
    obs0 = cpp.reset()
    # drive the JAX env from the C++ pool's reset states
    jenv = CartPole()
    states = CartPoleState(
        x=jnp.asarray(obs0[:, 0]),
        x_dot=jnp.asarray(obs0[:, 1]),
        theta=jnp.asarray(obs0[:, 2]),
        theta_dot=jnp.asarray(obs0[:, 3]),
        t=jnp.zeros(4, jnp.int32),
    )
    acts = np.array([1, 0, 1, 0], np.float32)
    res_cpp, _ = cpp.step(acts)
    step_v = jax.vmap(jenv.step)
    states, res_jax = step_v(states, jnp.asarray(acts.astype(np.int32)))
    np.testing.assert_allclose(
        res_cpp.obs, np.asarray(res_jax.obs), rtol=1e-5, atol=1e-6
    )
    cpp.close()


def test_pendulum_dynamics_match_jax_env():
    import jax
    import jax.numpy as jnp

    from tianshou_tpu.envs.classic import Pendulum, PendulumState

    cpp = CppVectorEnv("Pendulum-v1", 4, seed=11)
    obs0 = cpp.reset()
    theta = np.arctan2(obs0[:, 1], obs0[:, 0])
    states = PendulumState(
        theta=jnp.asarray(theta),
        theta_dot=jnp.asarray(obs0[:, 2]),
        t=jnp.zeros(4, jnp.int32),
    )
    acts = np.array([[0.5], [-1.0], [2.0], [0.0]], np.float32)
    res_cpp, _ = cpp.step(acts)
    jenv = Pendulum()
    states, res_jax = jax.vmap(jenv.step)(states, jnp.asarray(acts))
    np.testing.assert_allclose(
        res_cpp.obs, np.asarray(res_jax.obs), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        res_cpp.reward, np.asarray(res_jax.reward), rtol=1e-4, atol=1e-5
    )
    cpp.close()


def test_dqn_learns_through_cpp_pool():
    import jax

    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.spaces import Discrete
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    algo = DQN(
        network=QNet((128, 128, 128), 2),
        action_space=Discrete(2),
        gamma=0.9,
        n_step=3,
        target_update_freq=320,
    )
    buffer = ReplayBuffer(capacity=2000, num_envs=16)
    trainer = OffPolicyTrainer(
        algo,
        HostCollector(algo, CppVectorEnv("CartPole-v1", 16, seed=0), buffer),
        HostCollector(algo, CppVectorEnv("CartPole-v1", 16, seed=99)),
        buffer,
        max_epoch=4,
        step_per_epoch=10000,
        step_per_collect=160,
        update_per_step=0.1,
        batch_size=64,
        train_param_fn=lambda e, s: 0.1,
        stop_fn=lambda rew: rew >= 195,
        warmup_steps=1000,
        seed=0,
    )
    info = trainer.run()
    assert info.stop_triggered, f"best={info.best_reward}"
