"""Exploration noise processes (counterpart of
``tianshou/exploration/random.py:7-60``: ``BaseNoise``/``GaussianNoise``/
``OUNoise``), re-designed with explicit PRNG keys and functional state so
they compose with jitted collect scans."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["GaussianNoise", "OUNoise"]


class GaussianNoise:
    """i.i.d. Gaussian noise with given sigma (``random.py:20``)."""

    def __init__(self, mu: float = 0.0, sigma: float = 1.0):
        self.mu = mu
        self.sigma = sigma

    def init_state(self, shape: tuple[int, ...]) -> jax.Array:
        return jnp.zeros(shape)  # stateless; kept for API uniformity

    def sample(self, state, key: jax.Array, shape: tuple[int, ...]):
        return state, self.mu + self.sigma * jax.random.normal(key, shape)


class OUNoise:
    """Ornstein-Uhlenbeck process (``random.py:35``):
    ``x_{t+1} = x_t + theta*(mu - x_t)*dt + sigma*sqrt(dt)*N(0,1)``."""

    def __init__(
        self,
        mu: float = 0.0,
        sigma: float = 0.3,
        theta: float = 0.15,
        dt: float = 1e-2,
        x0: float = 0.0,
    ):
        self.mu = mu
        self.sigma = sigma
        self.theta = theta
        self.dt = dt
        self.x0 = x0

    def init_state(self, shape: tuple[int, ...]) -> jax.Array:
        return jnp.full(shape, self.x0)

    def sample(self, state: jax.Array, key: jax.Array, shape=None):
        noise = jax.random.normal(key, state.shape)
        new = (
            state
            + self.theta * (self.mu - state) * self.dt
            + self.sigma * jnp.sqrt(self.dt) * noise
        )
        return new, new
