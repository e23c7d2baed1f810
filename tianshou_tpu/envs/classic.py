"""Pure-JAX classic-control environments (CartPole, Pendulum, MountainCar).

These replace gym.make + process workers for the CartPole/Pendulum-class
tasks the reference tests and benches against (``test/discrete/test_dqn.py``,
``test/continuous/test_sac_with_il.py`` etc.): the dynamics are implemented
from the published classic-control equations as fixed-shape jnp ops so that
thousands of instances step in lockstep under ``vmap`` inside the jitted
collector — the source of the env-throughput headroom targeted in
BASELINE.md.

Physics constants follow the standard OpenAI Gym / gymnasium definitions of
CartPole-v1, Pendulum-v1 and MountainCarContinuous-v0 so that learned-return
thresholds (195 for CartPole, ~-250 for Pendulum) are directly comparable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.envs.base import JaxEnv, StepResult
from tianshou_tpu.envs.spaces import Box, Discrete

__all__ = ["CartPole", "Pendulum", "MountainCarContinuous", "Acrobot", "make_env"]


class CartPoleState(NamedTuple):
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array
    theta_dot: jax.Array
    t: jax.Array


class CartPole(JaxEnv):
    """CartPole-v1: balance a pole on a force-controlled cart.

    Euler-integrated pole-on-cart dynamics; reward 1 per step; terminates
    when |x|>2.4 or |theta|>12 deg; truncates at 500 steps.
    """

    GRAVITY = 9.8
    MASS_CART = 1.0
    MASS_POLE = 0.1
    LENGTH = 0.5  # half pole length
    FORCE_MAG = 10.0
    TAU = 0.02
    X_LIMIT = 2.4
    THETA_LIMIT = 12 * jnp.pi / 180
    MAX_STEPS = 500

    observation_space = Box(low=-jnp.inf, high=jnp.inf, shape=(4,))
    action_space = Discrete(2)

    def reset(self, key: jax.Array):
        vals = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        state = CartPoleState(
            vals[0], vals[1], vals[2], vals[3], jnp.zeros((), jnp.int32)
        )
        return state, self._obs(state)

    @staticmethod
    def _obs(s: CartPoleState) -> jax.Array:
        return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot]).astype(jnp.float32)

    def step(self, state: CartPoleState, action: jax.Array):
        force = jnp.where(action > 0, self.FORCE_MAG, -self.FORCE_MAG)
        total_mass = self.MASS_CART + self.MASS_POLE
        pole_ml = self.MASS_POLE * self.LENGTH
        cos_t = jnp.cos(state.theta)
        sin_t = jnp.sin(state.theta)
        temp = (force + pole_ml * state.theta_dot**2 * sin_t) / total_mass
        theta_acc = (self.GRAVITY * sin_t - cos_t * temp) / (
            self.LENGTH * (4.0 / 3.0 - self.MASS_POLE * cos_t**2 / total_mass)
        )
        x_acc = temp - pole_ml * theta_acc * cos_t / total_mass
        new = CartPoleState(
            x=state.x + self.TAU * state.x_dot,
            x_dot=state.x_dot + self.TAU * x_acc,
            theta=state.theta + self.TAU * state.theta_dot,
            theta_dot=state.theta_dot + self.TAU * theta_acc,
            t=state.t + 1,
        )
        terminated = (jnp.abs(new.x) > self.X_LIMIT) | (
            jnp.abs(new.theta) > self.THETA_LIMIT
        )
        truncated = (new.t >= self.MAX_STEPS) & ~terminated
        return new, StepResult(
            obs=self._obs(new),
            reward=jnp.ones((), jnp.float32),
            terminated=terminated,
            truncated=truncated,
        )


class PendulumState(NamedTuple):
    theta: jax.Array
    theta_dot: jax.Array
    t: jax.Array


class Pendulum(JaxEnv):
    """Pendulum-v1: swing up a pendulum with bounded torque.

    Reward ``-(angle^2 + 0.1*thdot^2 + 0.001*u^2)``; no termination;
    truncates at 200 steps.  Obs is ``[cos, sin, thdot]``.
    """

    MAX_SPEED = 8.0
    MAX_TORQUE = 2.0
    DT = 0.05
    G = 10.0
    M = 1.0
    L = 1.0
    MAX_STEPS = 200

    observation_space = Box(low=(-1.0, -1.0, -8.0), high=(1.0, 1.0, 8.0), shape=(3,))
    action_space = Box(low=-2.0, high=2.0, shape=(1,))

    def reset(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        theta_dot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
        state = PendulumState(theta, theta_dot, jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    @staticmethod
    def _obs(s: PendulumState) -> jax.Array:
        return jnp.stack(
            [jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot]
        ).astype(jnp.float32)

    def step(self, state: PendulumState, action: jax.Array):
        u = jnp.clip(action.reshape(()), -self.MAX_TORQUE, self.MAX_TORQUE)
        theta_norm = ((state.theta + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        cost = theta_norm**2 + 0.1 * state.theta_dot**2 + 0.001 * u**2
        new_dot = state.theta_dot + (
            3.0 * self.G / (2.0 * self.L) * jnp.sin(state.theta)
            + 3.0 / (self.M * self.L**2) * u
        ) * self.DT
        new_dot = jnp.clip(new_dot, -self.MAX_SPEED, self.MAX_SPEED)
        new = PendulumState(
            theta=state.theta + new_dot * self.DT,
            theta_dot=new_dot,
            t=state.t + 1,
        )
        return new, StepResult(
            obs=self._obs(new),
            reward=(-cost).astype(jnp.float32),
            terminated=jnp.zeros((), bool),
            truncated=new.t >= self.MAX_STEPS,
        )


class MountainCarState(NamedTuple):
    position: jax.Array
    velocity: jax.Array
    t: jax.Array


class MountainCarContinuous(JaxEnv):
    """MountainCarContinuous-v0: drive up a hill with a weak engine."""

    MIN_POS = -1.2
    MAX_POS = 0.6
    MAX_SPEED = 0.07
    GOAL_POS = 0.45
    POWER = 0.0015
    MAX_STEPS = 999

    observation_space = Box(low=(-1.2, -0.07), high=(0.6, 0.07), shape=(2,))
    action_space = Box(low=-1.0, high=1.0, shape=(1,))

    def reset(self, key: jax.Array):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        state = MountainCarState(pos, jnp.zeros(()), jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    @staticmethod
    def _obs(s: MountainCarState) -> jax.Array:
        return jnp.stack([s.position, s.velocity]).astype(jnp.float32)

    def step(self, state: MountainCarState, action: jax.Array):
        force = jnp.clip(action.reshape(()), -1.0, 1.0)
        velocity = state.velocity + force * self.POWER - 0.0025 * jnp.cos(
            3 * state.position
        )
        velocity = jnp.clip(velocity, -self.MAX_SPEED, self.MAX_SPEED)
        position = jnp.clip(state.position + velocity, self.MIN_POS, self.MAX_POS)
        velocity = jnp.where(
            (position <= self.MIN_POS) & (velocity < 0), 0.0, velocity
        )
        new = MountainCarState(position, velocity, state.t + 1)
        terminated = position >= self.GOAL_POS
        reward = jnp.where(terminated, 100.0, 0.0) - 0.1 * force**2
        return new, StepResult(
            obs=self._obs(new),
            reward=reward.astype(jnp.float32),
            terminated=terminated,
            truncated=(new.t >= self.MAX_STEPS) & ~terminated,
        )


class AcrobotState(NamedTuple):
    theta1: jax.Array
    theta2: jax.Array
    dtheta1: jax.Array
    dtheta2: jax.Array
    t: jax.Array


class Acrobot(JaxEnv):
    """Acrobot-v1: swing a two-link pendulum above the bar (RK4 dynamics)."""

    DT = 0.2
    L1 = 1.0
    L2 = 1.0
    M1 = 1.0
    M2 = 1.0
    LC1 = 0.5
    LC2 = 0.5
    I1 = 1.0
    I2 = 1.0
    G = 9.8
    MAX_VEL1 = 4 * jnp.pi
    MAX_VEL2 = 9 * jnp.pi
    TORQUES = (-1.0, 0.0, 1.0)
    MAX_STEPS = 500

    observation_space = Box(
        low=(-1, -1, -1, -1, -4 * 3.1416, -9 * 3.1416),
        high=(1, 1, 1, 1, 4 * 3.1416, 9 * 3.1416),
        shape=(6,),
    )
    action_space = Discrete(3)

    def reset(self, key: jax.Array):
        v = jax.random.uniform(key, (4,), minval=-0.1, maxval=0.1)
        state = AcrobotState(v[0], v[1], v[2], v[3], jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    @staticmethod
    def _obs(s: AcrobotState) -> jax.Array:
        return jnp.stack(
            [
                jnp.cos(s.theta1),
                jnp.sin(s.theta1),
                jnp.cos(s.theta2),
                jnp.sin(s.theta2),
                s.dtheta1,
                s.dtheta2,
            ]
        ).astype(jnp.float32)

    def _dsdt(self, s: jax.Array, torque: jax.Array) -> jax.Array:
        theta1, theta2, dtheta1, dtheta2 = s[0], s[1], s[2], s[3]
        d1 = (
            self.M1 * self.LC1**2
            + self.M2
            * (self.L1**2 + self.LC2**2 + 2 * self.L1 * self.LC2 * jnp.cos(theta2))
            + self.I1
            + self.I2
        )
        d2 = (
            self.M2 * (self.LC2**2 + self.L1 * self.LC2 * jnp.cos(theta2)) + self.I2
        )
        phi2 = self.M2 * self.LC2 * self.G * jnp.cos(theta1 + theta2 - jnp.pi / 2)
        phi1 = (
            -self.M2 * self.L1 * self.LC2 * dtheta2**2 * jnp.sin(theta2)
            - 2 * self.M2 * self.L1 * self.LC2 * dtheta2 * dtheta1 * jnp.sin(theta2)
            + (self.M1 * self.LC1 + self.M2 * self.L1)
            * self.G
            * jnp.cos(theta1 - jnp.pi / 2)
            + phi2
        )
        ddtheta2 = (
            torque
            + d2 / d1 * phi1
            - self.M2 * self.L1 * self.LC2 * dtheta1**2 * jnp.sin(theta2)
            - phi2
        ) / (self.M2 * self.LC2**2 + self.I2 - d2**2 / d1)
        ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
        return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2])

    def step(self, state: AcrobotState, action: jax.Array):
        torque = jnp.asarray(self.TORQUES)[action]
        s0 = jnp.stack([state.theta1, state.theta2, state.dtheta1, state.dtheta2])
        # RK4 integration over one DT
        k1 = self._dsdt(s0, torque)
        k2 = self._dsdt(s0 + self.DT / 2 * k1, torque)
        k3 = self._dsdt(s0 + self.DT / 2 * k2, torque)
        k4 = self._dsdt(s0 + self.DT * k3, torque)
        s1 = s0 + self.DT / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        wrap = lambda x: ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        new = AcrobotState(
            theta1=wrap(s1[0]),
            theta2=wrap(s1[1]),
            dtheta1=jnp.clip(s1[2], -self.MAX_VEL1, self.MAX_VEL1),
            dtheta2=jnp.clip(s1[3], -self.MAX_VEL2, self.MAX_VEL2),
            t=state.t + 1,
        )
        terminated = (
            -jnp.cos(new.theta1) - jnp.cos(new.theta2 + new.theta1) > 1.0
        )
        return new, StepResult(
            obs=self._obs(new),
            reward=jnp.where(terminated, 0.0, -1.0).astype(jnp.float32),
            terminated=terminated,
            truncated=(new.t >= self.MAX_STEPS) & ~terminated,
        )


class NChainState(NamedTuple):
    s: jax.Array
    t: jax.Array


class NChain(JaxEnv):
    """NChain: tabular chain MDP for PSRL-style model-based algorithms.

    Action 0 moves forward (reward 0, large reward ``BIG`` at the end);
    action 1 returns to start with small reward 2; 'slip' probability
    flips the action.  Integer observations (state index).
    """

    N = 5
    SLIP = 0.2
    SMALL = 2.0
    BIG = 10.0
    MAX_STEPS = 100

    observation_space = Box(low=0.0, high=4.0, shape=(1,))
    action_space = Discrete(2)

    def reset(self, key: jax.Array):
        state = NChainState(jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    @staticmethod
    def _obs(st: NChainState) -> jax.Array:
        return st.s.astype(jnp.float32)[None]

    def step(self, state: NChainState, action: jax.Array):
        # stochastic slip requires a per-step key: derive from state
        key = jax.random.fold_in(jax.random.key(17), state.t * 1000 + state.s)
        slip = jax.random.uniform(key) < self.SLIP
        a = jnp.where(slip, 1 - action.astype(jnp.int32), action.astype(jnp.int32))
        fwd_s = jnp.minimum(state.s + 1, self.N - 1)
        at_end = state.s == self.N - 1
        rew_fwd = jnp.where(at_end, self.BIG, 0.0)
        s_new = jnp.where(a == 0, fwd_s, 0)
        rew = jnp.where(a == 0, rew_fwd, self.SMALL)
        new = NChainState(s_new.astype(jnp.int32), state.t + 1)
        return new, StepResult(
            obs=self._obs(new),
            reward=rew.astype(jnp.float32),
            terminated=jnp.zeros((), bool),
            truncated=new.t >= self.MAX_STEPS,
        )


_REGISTRY = {
    "CartPole-v1": CartPole,
    "Pendulum-v1": Pendulum,
    "MountainCarContinuous-v0": MountainCarContinuous,
    "Acrobot-v1": Acrobot,
    "NChain-v0": NChain,
}


def make_env(name: str) -> JaxEnv:
    """Factory over the pure-JAX env registry (analog of ``gym.make`` in the
    reference's ``EnvFactoryRegistered``, ``highlevel/env.py``)."""
    if name.lower().startswith("minatar"):
        from tianshou_tpu.envs.minatar import make_minatar

        return make_minatar(name)
    if name not in _REGISTRY:
        raise KeyError(f"Unknown JAX env {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]()
