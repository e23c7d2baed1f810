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


def test_acrobot_dynamics_match_jax_env():
    import jax
    import jax.numpy as jnp

    from tianshou_tpu.envs.classic import Acrobot, AcrobotState

    cpp = CppVectorEnv("Acrobot-v1", 4, seed=5)
    obs0 = cpp.reset()
    states = AcrobotState(
        theta1=jnp.asarray(np.arctan2(obs0[:, 1], obs0[:, 0])),
        theta2=jnp.asarray(np.arctan2(obs0[:, 3], obs0[:, 2])),
        dtheta1=jnp.asarray(obs0[:, 4]),
        dtheta2=jnp.asarray(obs0[:, 5]),
        t=jnp.zeros(4, jnp.int32),
    )
    jenv = Acrobot()
    acts = np.array([0, 1, 2, 2], np.float32)
    for _ in range(5):  # several RK4 steps compound any physics mismatch
        res_cpp, _ = cpp.step(acts)
        states, res_jax = jax.vmap(jenv.step)(
            states, jnp.asarray(acts.astype(np.int32))
        )
    np.testing.assert_allclose(
        res_cpp.obs, np.asarray(res_jax.obs), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        res_cpp.reward, np.asarray(res_jax.reward), rtol=1e-5, atol=1e-6
    )
    cpp.close()


def test_mountaincar_dynamics_match_gym():
    gym = pytest.importorskip("gymnasium")
    cpp = CppVectorEnv("MountainCar-v0", 3, seed=13)
    obs0 = cpp.reset()
    genv = gym.make("MountainCar-v0")
    genv.reset(seed=0)
    acts = np.array([0, 1, 2], np.float32)
    res_cpp, _ = cpp.step(acts)
    for i in range(3):
        genv.unwrapped.state = np.array(obs0[i], np.float64)
        gobs, grew, gterm, gtrunc, _ = genv.step(int(acts[i]))
        np.testing.assert_allclose(res_cpp.obs[i], gobs, rtol=1e-5, atol=1e-6)
        assert res_cpp.reward[i] == grew
    genv.close()
    cpp.close()


def test_mountaincar_reaches_goal_and_autoresets():
    """Drive right with momentum pumping; the goal must be reachable and
    auto-reset must start a fresh episode."""
    cpp = CppVectorEnv("MountainCar-v0", 1, seed=1)
    obs = cpp.reset()
    terminated = False
    for _ in range(200):
        # bang-bang: push in the direction of motion
        a = 2.0 if obs[0, 1] >= 0 else 0.0
        res, carry = cpp.step(np.array([a], np.float32))
        if res.terminated[0]:
            terminated = True
            assert res.obs[0, 0] >= 0.5  # terminal obs at the goal
            assert -0.6 <= carry[0, 0] <= -0.4  # reset obs in start band
            break
        obs = carry
    assert terminated, "momentum pumping must reach the goal within 200 steps"
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
