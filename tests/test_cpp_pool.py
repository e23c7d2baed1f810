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


def test_reacher_dynamics_match_python_rk4_oracle():
    """The C++ 2-link reacher (the expensive-simulator representative)
    against a hand-rolled Python RK4 oracle of the same manipulator
    equations: fingertip kinematics, reward, truncation at 50."""
    import numpy as np

    from tianshou_tpu.envs.cpp_pool import CppVectorEnv

    L1, L2 = 0.1, 0.11
    M1 = M2 = 0.05
    DAMP, GEAR, DT, SUB = 0.01, 0.05, 0.01, 4

    def dsdt(s, tau):
        lc1, lc2 = L1 / 2, L2 / 2
        i1, i2 = M1 * L1**2 / 12, M2 * L2**2 / 12
        q2, dq1, dq2 = s[1], s[2], s[3]
        c2, s2 = np.cos(q2), np.sin(q2)
        a11 = i1 + i2 + M1 * lc1**2 + M2 * (L1**2 + lc2**2 + 2 * L1 * lc2 * c2)
        a12 = i2 + M2 * (lc2**2 + L1 * lc2 * c2)
        a22 = i2 + M2 * lc2**2
        h = M2 * L1 * lc2 * s2
        c_1 = -h * dq2**2 - 2 * h * dq1 * dq2
        c_2 = h * dq1**2
        rhs = np.array([tau[0] - c_1 - DAMP * dq1, tau[1] - c_2 - DAMP * dq2])
        A = np.array([[a11, a12], [a12, a22]])
        dd = np.linalg.solve(A, rhs)
        return np.array([dq1, dq2, dd[0], dd[1]])

    def oracle_step(q, tau):
        for _ in range(SUB):
            k1 = dsdt(q, tau)
            k2 = dsdt(q + 0.5 * DT * k1, tau)
            k3 = dsdt(q + 0.5 * DT * k2, tau)
            k4 = dsdt(q + DT * k3, tau)
            q = q + DT / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        return q

    env = CppVectorEnv("Reacher2", 4, seed=11)
    obs = env.reset()
    # recover joint state from obs (atan2 of cos/sin + velocities)
    q = np.stack(
        [
            np.arctan2(obs[:, 2], obs[:, 0]),
            np.arctan2(obs[:, 3], obs[:, 1]),
            obs[:, 6],
            obs[:, 7],
        ],
        axis=1,
    )
    target = obs[:, 4:6].copy()
    rng = np.random.default_rng(0)
    for t in range(6):
        act = rng.uniform(-1, 1, (4, 2)).astype(np.float32)
        res, carry = env.step(act)
        for i in range(4):
            q[i] = oracle_step(q[i], GEAR * act[i].astype(np.float64))
            tip = np.array(
                [
                    L1 * np.cos(q[i, 0]) + L2 * np.cos(q[i, 0] + q[i, 1]),
                    L1 * np.sin(q[i, 0]) + L2 * np.sin(q[i, 0] + q[i, 1]),
                ]
            )
            np.testing.assert_allclose(
                res.obs[i, 8:10], tip - target[i], atol=1e-4
            )
            dist = np.linalg.norm(tip - target[i])
            expected_rew = -(dist + 0.1 * float((act[i] ** 2).sum()))
            np.testing.assert_allclose(res.reward[i], expected_rew, atol=1e-4)
    env.close()


def test_reacher_truncates_at_50_and_autoresets():
    import numpy as np

    from tianshou_tpu.envs.cpp_pool import CppVectorEnv

    env = CppVectorEnv("Reacher2", 2, seed=5)
    env.reset()
    for t in range(1, 51):
        res, carry = env.step(np.zeros((2, 2), np.float32))
    assert res.truncated.all() and not res.terminated.any()
    # carry obs is a fresh episode (distance-to-target differs from terminal)
    assert not np.allclose(carry, res.obs)
    res2, _ = env.step(np.zeros((2, 2), np.float32))
    assert not res2.truncated.any()
    env.close()
