"""Continuous-control actor/critic modules (flax.linen).

Counterparts of ``tianshou/utils/net/continuous.py`` (``Actor:24``,
``ActorProb:181``, ``Critic:100``) plus the offline-RL auxiliaries
(``Perturbation:410``, ``VAE:451``) re-designed as pure flax modules.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tianshou_tpu.networks.common import MLP

__all__ = [
    "DeterministicActor",
    "GaussianActor",
    "Critic",
    "CriticEnsemble",
    "ValueNet",
    "Perturbation",
    "VAE",
]

LOG_SIG_MIN = -20.0
LOG_SIG_MAX = 2.0


class DeterministicActor(nn.Module):
    """obs -> tanh-bounded action scaled to ``max_action`` (DDPG/TD3 actor)."""

    hidden_sizes: Sequence[int]
    action_dim: int
    max_action: float = 1.0
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        x = MLP(
            self.hidden_sizes, self.action_dim,
            compute_dtype=self.compute_dtype,
        )(obs)
        return self.max_action * jnp.tanh(x)


class GaussianActor(nn.Module):
    """obs -> (mu, sigma) of a diagonal Gaussian (PPO/SAC actor).

    ``conditioned_sigma=True`` (SAC): sigma is a state-dependent head;
    otherwise a state-independent learned parameter (PPO-style), matching
    reference ``ActorProb`` (``utils/net/continuous.py:181``).
    """

    hidden_sizes: Sequence[int]
    action_dim: int
    conditioned_sigma: bool = False
    compute_dtype: jnp.dtype | None = None
    # initial log-sigma of the state-independent head (reference MuJoCo PPO
    # inits sigma_param to -0.5, mujoco_ppo.py actor setup)
    sigma_init: float = 0.0

    @nn.compact
    def __call__(self, obs: jax.Array) -> tuple[jax.Array, jax.Array]:
        feat = MLP(
            self.hidden_sizes, None, compute_dtype=self.compute_dtype
        )(obs)
        mu = nn.Dense(self.action_dim, kernel_init=nn.initializers.orthogonal(0.01))(
            feat
        )
        if self.conditioned_sigma:
            log_sigma = nn.Dense(self.action_dim)(feat)
            log_sigma = jnp.clip(log_sigma, LOG_SIG_MIN, LOG_SIG_MAX)
        else:
            log_sigma = self.param(
                "log_sigma",
                nn.initializers.constant(self.sigma_init),
                (self.action_dim,),
            )
            log_sigma = jnp.broadcast_to(
                jnp.clip(log_sigma, LOG_SIG_MIN, LOG_SIG_MAX), mu.shape
            )
        return mu, jnp.exp(log_sigma)


class Critic(nn.Module):
    """(obs, act) -> scalar Q (reference ``Critic``)."""

    hidden_sizes: Sequence[int]
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, obs: jax.Array, act: jax.Array) -> jax.Array:
        x = jnp.concatenate(
            [obs.reshape(obs.shape[0], -1), act.reshape(act.shape[0], -1)], axis=-1
        )
        return MLP(
            self.hidden_sizes, 1, compute_dtype=self.compute_dtype
        )(x).squeeze(-1)


class CriticEnsemble(nn.Module):
    """K independent Q critics evaluated together: (obs, act) -> [K, B].

    K=2 gives the twin critics of TD3/SAC; larger K serves REDQ.  The
    ensemble axis becomes one batched matmul on the MXU via ``nn.vmap``
    (replacing the reference's separate ``critic1``/``critic2`` modules and
    ``EnsembleLinear``).
    """

    hidden_sizes: Sequence[int]
    num_critics: int = 2
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, obs: jax.Array, act: jax.Array) -> jax.Array:
        vcritic = nn.vmap(
            Critic,
            in_axes=None,
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            axis_size=self.num_critics,
        )
        return vcritic(
            self.hidden_sizes, compute_dtype=self.compute_dtype
        )(obs, act)


class ValueNet(nn.Module):
    """obs -> scalar V (on-policy critic)."""

    hidden_sizes: Sequence[int]
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        return MLP(
            self.hidden_sizes, 1, compute_dtype=self.compute_dtype
        )(obs).squeeze(-1)


class Perturbation(nn.Module):
    """BCQ perturbation net: bounded additive adjustment of a sampled action
    (reference ``utils/net/continuous.py:410``)."""

    hidden_sizes: Sequence[int]
    action_dim: int
    max_action: float = 1.0
    phi: float = 0.05

    @nn.compact
    def __call__(self, obs: jax.Array, act: jax.Array) -> jax.Array:
        x = jnp.concatenate([obs, act], axis=-1)
        adj = self.phi * self.max_action * jnp.tanh(
            MLP(self.hidden_sizes, self.action_dim)(x)
        )
        return jnp.clip(act + adj, -self.max_action, self.max_action)


class VAE(nn.Module):
    """Conditional VAE behavior model for BCQ
    (reference ``utils/net/continuous.py:451``)."""

    hidden_sizes: Sequence[int]
    action_dim: int
    latent_dim: int
    max_action: float = 1.0

    def setup(self):
        self.encoder = MLP(self.hidden_sizes, None)
        self.mean_head = nn.Dense(self.latent_dim)
        self.log_std_head = nn.Dense(self.latent_dim)
        self.decoder = MLP(tuple(reversed(self.hidden_sizes)), self.action_dim)

    def __call__(
        self, obs: jax.Array, act: jax.Array, key: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        h = self.encoder(jnp.concatenate([obs, act], axis=-1))
        mean = self.mean_head(h)
        log_std = jnp.clip(self.log_std_head(h), -4.0, 15.0)
        z = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        recon = self.decode(obs, z)
        return recon, mean, log_std

    def decode(self, obs: jax.Array, z: jax.Array | None = None, key: jax.Array | None = None):
        if z is None:
            z = jnp.clip(
                jax.random.normal(key, (obs.shape[0], self.latent_dim)), -0.5, 0.5
            )
        return self.max_action * jnp.tanh(
            self.decoder(jnp.concatenate([obs, z], axis=-1))
        )
