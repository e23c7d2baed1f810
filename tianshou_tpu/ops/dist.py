"""Minimal distribution math (diagonal Gaussian, tanh-squashed Gaussian,
categorical) as pure jnp functions.

Replaces the reference's use of ``torch.distributions`` (``Independent(
Normal)`` in PPO/SAC, ``Categorical`` in discrete actors) with explicit
PRNG-key-threaded sampling that stays inside jitted collect/update scans.
The tanh log-prob correction uses the numerically stable softplus form
(the reference's ``sac.py:170-198`` computes the same quantity via
``log(1 - tanh(x)^2 + eps)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "normal_sample",
    "normal_log_prob",
    "normal_entropy",
    "tanh_normal_sample_and_log_prob",
    "tanh_log_prob_correction",
    "categorical_sample",
    "categorical_log_prob",
    "categorical_entropy",
    "kl_normal",
    "kl_categorical",
]

_LOG_2PI = jnp.log(2.0 * jnp.pi)
_LOG_2 = jnp.log(2.0)


def normal_sample(key: jax.Array, mu: jax.Array, sigma: jax.Array) -> jax.Array:
    return mu + sigma * jax.random.normal(key, mu.shape)


def normal_log_prob(x: jax.Array, mu: jax.Array, sigma: jax.Array) -> jax.Array:
    """Sum over the trailing action dim (Independent(Normal, 1))."""
    z = (x - mu) / sigma
    lp = -0.5 * (z**2 + _LOG_2PI) - jnp.log(sigma)
    return lp.sum(axis=-1)


def normal_entropy(sigma: jax.Array) -> jax.Array:
    return (0.5 * (1.0 + _LOG_2PI) + jnp.log(sigma)).sum(axis=-1)


def tanh_log_prob_correction(pre_tanh: jax.Array) -> jax.Array:
    """``sum_i log(1 - tanh(u_i)^2)`` computed stably:
    ``log(1 - tanh(u)^2) = 2 * (log 2 - u - softplus(-2u))``."""
    return (2.0 * (_LOG_2 - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh))).sum(
        axis=-1
    )


def tanh_normal_sample_and_log_prob(
    key: jax.Array, mu: jax.Array, sigma: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Reparameterized sample of ``tanh(Normal)`` with its log-prob."""
    u = normal_sample(key, mu, sigma)
    a = jnp.tanh(u)
    logp = normal_log_prob(u, mu, sigma) - tanh_log_prob_correction(u)
    return a, logp


def categorical_sample(key: jax.Array, logits: jax.Array) -> jax.Array:
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def categorical_log_prob(act: jax.Array, logits: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, act[..., None].astype(jnp.int32), axis=-1).squeeze(
        -1
    )


def categorical_entropy(logits: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -(jnp.exp(logp) * logp).sum(axis=-1)


def kl_normal(
    mu_p: jax.Array, sigma_p: jax.Array, mu_q: jax.Array, sigma_q: jax.Array
) -> jax.Array:
    """KL(p || q) for diagonal Gaussians, summed over the action dim."""
    var_ratio = (sigma_p / sigma_q) ** 2
    t = ((mu_p - mu_q) / sigma_q) ** 2
    return (0.5 * (var_ratio + t - 1.0) - jnp.log(jnp.sqrt(var_ratio))).sum(
        axis=-1
    )


def kl_categorical(logits_p: jax.Array, logits_q: jax.Array) -> jax.Array:
    """KL(p || q) between categorical distributions given logits."""
    logp = jax.nn.log_softmax(logits_p, axis=-1)
    logq = jax.nn.log_softmax(logits_q, axis=-1)
    return (jnp.exp(logp) * (logp - logq)).sum(axis=-1)
