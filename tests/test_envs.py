"""Pure-JAX env tests: shapes, determinism, time limits, auto-reset
semantics (the analog of ``test/base/test_env.py`` for the on-device
backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.envs.base import VectorEnv
from tianshou_tpu.envs.classic import (
    Acrobot,
    CartPole,
    MountainCarContinuous,
    Pendulum,
    make_env,
)


@pytest.mark.parametrize("name", [
    "CartPole-v1", "Pendulum-v1", "MountainCarContinuous-v0", "Acrobot-v1",
])
def test_reset_step_shapes(name):
    env = make_env(name)
    key = jax.random.key(0)
    state, obs = env.reset(key)
    assert obs.shape == env.observation_space.shape
    act = env.action_space.sample(jax.random.key(1))
    state, res = env.step(state, act)
    assert res.obs.shape == env.observation_space.shape
    assert res.reward.shape == ()
    assert res.terminated.dtype == bool and res.truncated.dtype == bool


def test_cartpole_truncates_at_500():
    env = CartPole()
    # hold the pole perfectly? Not possible; instead check that the step
    # counter drives truncation by constructing the state directly.
    state, _ = env.reset(jax.random.key(0))
    state = state._replace(t=jnp.asarray(499, jnp.int32))
    # place pole upright so no termination triggers
    state = state._replace(
        x=jnp.zeros(()), x_dot=jnp.zeros(()), theta=jnp.zeros(()),
        theta_dot=jnp.zeros(()),
    )
    _, res = env.step(state, jnp.asarray(0))
    assert bool(res.truncated) and not bool(res.terminated)


def test_pendulum_truncates_at_200_and_never_terminates():
    env = Pendulum()
    state, _ = env.reset(jax.random.key(0))
    state = state._replace(t=jnp.asarray(199, jnp.int32))
    _, res = env.step(state, jnp.zeros(1))
    assert bool(res.truncated) and not bool(res.terminated)
    assert float(res.reward) <= 0.0


def test_determinism():
    env = CartPole()
    s1, o1 = env.reset(jax.random.key(42))
    s2, o2 = env.reset(jax.random.key(42))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    _, r1 = env.step(s1, jnp.asarray(1))
    _, r2 = env.step(s2, jnp.asarray(1))
    np.testing.assert_array_equal(np.asarray(r1.obs), np.asarray(r2.obs))


def test_vector_env_autoreset():
    env = CartPole()
    venv = VectorEnv(env, num_envs=4)
    key = jax.random.key(0)
    state, obs = venv.reset(key)
    assert obs.shape == (4, 4)

    # drive with constant action until some env terminates
    done_seen = False
    for i in range(200):
        acts = jnp.ones((4,), jnp.int32)
        state, res, carry_obs = venv.step(state, acts, jax.random.key(i))
        done = np.asarray(res.terminated | res.truncated)
        if done.any():
            done_seen = True
            j = int(np.nonzero(done)[0][0])
            # carry obs for done env is a reset obs (within init bounds),
            # while res.obs keeps the terminal observation
            assert np.all(np.abs(np.asarray(carry_obs)[j]) <= 0.05 + 1e-6)
            term_obs = np.asarray(res.obs)[j]
            assert np.abs(term_obs).max() > 0.05  # genuinely terminal-ish
            # non-done envs carry the stepped obs unchanged
            for k in np.nonzero(~done)[0]:
                np.testing.assert_array_equal(
                    np.asarray(carry_obs)[k], np.asarray(res.obs)[k]
                )
            break
    assert done_seen


def test_vector_env_step_counter_resets():
    env = Pendulum()
    venv = VectorEnv(env, num_envs=2)
    state, obs = venv.reset(jax.random.key(0))
    for i in range(200):
        state, res, _ = venv.step(
            state, jnp.zeros((2, 1)), jax.random.key(i)
        )
    # all envs truncated at step 200 and were auto-reset: t back to 0
    assert np.all(np.asarray(res.truncated))
    assert np.all(np.asarray(state.t) == 0)
