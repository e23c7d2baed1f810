"""Discrete-control network modules: distributional heads + noisy layers.

Counterparts of ``tianshou/utils/net/discrete.py`` (``NoisyLinear:321``,
``ImplicitQuantileNetwork:161``, ``FractionProposalNetwork:218``,
``FullQuantileFunction:254``) and the C51/QRDQN heads the reference builds
ad hoc in its example nets.  Noise for NoisyLinear is drawn from flax's rng
system (``rngs={'noise': key}``) so resampling-per-forward (the Rainbow rule,
``rainbow.py:442-456``) is an explicit key passed by the algorithm.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tianshou_tpu.networks.common import MLP

__all__ = [
    "NoisyLinear",
    "NoisyMLP",
    "C51Net",
    "QRDQNNet",
    "ImplicitQuantileNetwork",
    "FractionProposalNetwork",
    "FullQuantileFunction",
]


class NoisyLinear(nn.Module):
    """Factorized-Gaussian noisy linear layer (NoisyNet, arXiv 1706.10295).

    When ``noisy=False`` (evaluation) behaves as a plain linear layer using
    the mean weights.
    """

    features: int
    sigma0: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, noisy: bool = True) -> jax.Array:
        in_dim = x.shape[-1]
        bound = 1.0 / np.sqrt(in_dim)
        w_mu = self.param(
            "w_mu", nn.initializers.uniform(scale=2 * bound), (in_dim, self.features)
        )
        b_mu = self.param(
            "b_mu", nn.initializers.uniform(scale=2 * bound), (self.features,)
        )
        # uniform(scale) samples [0, scale); shift to [-bound, bound)
        w_mu = w_mu - bound
        b_mu = b_mu - bound
        sigma_init = self.sigma0 / np.sqrt(in_dim)
        w_sigma = self.param(
            "w_sigma",
            nn.initializers.constant(sigma_init),
            (in_dim, self.features),
        )
        b_sigma = self.param(
            "b_sigma", nn.initializers.constant(sigma_init), (self.features,)
        )
        if noisy:
            key = self.make_rng("noise")
            k1, k2 = jax.random.split(key)
            f = lambda e: jnp.sign(e) * jnp.sqrt(jnp.abs(e))
            eps_in = f(jax.random.normal(k1, (in_dim,)))
            eps_out = f(jax.random.normal(k2, (self.features,)))
            w = w_mu + w_sigma * jnp.outer(eps_in, eps_out)
            b = b_mu + b_sigma * eps_out
        else:
            w, b = w_mu, b_mu
        return x @ w + b


class NoisyMLP(nn.Module):
    """MLP whose final layers are NoisyLinear (Rainbow-style head)."""

    hidden_sizes: Sequence[int]
    output_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, noisy: bool = True) -> jax.Array:
        x = x.reshape(x.shape[0], -1)
        for h in self.hidden_sizes:
            x = nn.relu(NoisyLinear(h)(x, noisy))
        return NoisyLinear(self.output_dim)(x, noisy)


class C51Net(nn.Module):
    """obs -> per-action categorical distribution over support atoms
    ``[B, A, num_atoms]`` (probabilities, softmaxed)."""

    hidden_sizes: Sequence[int]
    num_actions: int
    num_atoms: int = 51
    noisy: bool = False
    dueling: bool = True

    @nn.compact
    def __call__(self, obs: jax.Array, noisy: bool = True) -> jax.Array:
        bsz = obs.shape[0]
        if self.noisy:
            feat = obs.reshape(bsz, -1)
            for h in self.hidden_sizes:
                feat = nn.relu(nn.Dense(h)(feat))
            if self.dueling:
                a = NoisyMLP((128,), self.num_actions * self.num_atoms)(feat, noisy)
                v = NoisyMLP((128,), self.num_atoms)(feat, noisy)
                logits = v[:, None, :] + a.reshape(
                    bsz, self.num_actions, self.num_atoms
                )
                logits = logits - a.reshape(
                    bsz, self.num_actions, self.num_atoms
                ).mean(axis=1, keepdims=True)
            else:
                logits = NoisyMLP((128,), self.num_actions * self.num_atoms)(
                    feat, noisy
                ).reshape(bsz, self.num_actions, self.num_atoms)
        else:
            logits = MLP(self.hidden_sizes, self.num_actions * self.num_atoms)(
                obs
            ).reshape(bsz, self.num_actions, self.num_atoms)
        return jax.nn.softmax(logits, axis=-1)


class QRDQNNet(nn.Module):
    """obs -> per-action quantile values ``[B, A, num_quantiles]``."""

    hidden_sizes: Sequence[int]
    num_actions: int
    num_quantiles: int = 200

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        bsz = obs.shape[0]
        out = MLP(self.hidden_sizes, self.num_actions * self.num_quantiles)(obs)
        return out.reshape(bsz, self.num_actions, self.num_quantiles)


class ImplicitQuantileNetwork(nn.Module):
    """IQN (arXiv 1806.06923): quantile values at sampled fractions.

    ``(obs [B, d], taus [B, K]) -> [B, K, A]`` via cosine embeddings of tau
    multiplied into the state features (reference
    ``utils/net/discrete.py:161``).
    """

    hidden_sizes: Sequence[int]
    num_actions: int
    embedding_dim: int = 64

    @nn.compact
    def __call__(self, obs: jax.Array, taus: jax.Array) -> jax.Array:
        feat = MLP(self.hidden_sizes, None)(obs)  # [B, F]
        F = feat.shape[-1]
        i = jnp.arange(1, self.embedding_dim + 1, dtype=jnp.float32)
        cos = jnp.cos(jnp.pi * taus[..., None] * i)  # [B, K, E]
        phi = nn.relu(nn.Dense(F)(cos))  # [B, K, F]
        x = feat[:, None, :] * phi  # [B, K, F]
        x = nn.relu(nn.Dense(F)(x))
        return nn.Dense(self.num_actions)(x)  # [B, K, A]


class FractionProposalNetwork(nn.Module):
    """FQF fraction proposal: state features -> K fractions in (0,1)
    (reference ``utils/net/discrete.py:218``).  Returns (taus [B, K+1],
    tau_hats [B, K], entropy [B])."""

    num_fractions: int = 32

    @nn.compact
    def __call__(self, feat: jax.Array):
        logits = nn.Dense(
            self.num_fractions,
            kernel_init=nn.initializers.xavier_uniform(),
        )(feat)
        probs = jax.nn.softmax(logits, axis=-1)
        tau = jnp.cumsum(probs, axis=-1)
        taus = jnp.concatenate([jnp.zeros_like(tau[:, :1]), tau], axis=-1)
        tau_hats = (taus[:, :-1] + taus[:, 1:]) / 2.0
        logp = jax.nn.log_softmax(logits, axis=-1)
        entropy = -(probs * logp).sum(axis=-1)
        return taus, tau_hats, entropy


class FullQuantileFunction(nn.Module):
    """FQF quantile function: an IQN-style trunk whose state features are
    also exposed (via ``method="features"``) so the fraction-proposal net can
    consume them (reference ``utils/net/discrete.py:254``)."""

    hidden_sizes: Sequence[int]
    num_actions: int
    embedding_dim: int = 64

    def setup(self):
        feat_dim = self.hidden_sizes[-1]
        self.trunk = MLP(self.hidden_sizes, None)
        self.phi = nn.Dense(feat_dim)
        self.head1 = nn.Dense(feat_dim)
        self.head2 = nn.Dense(self.num_actions)

    def features(self, obs: jax.Array) -> jax.Array:
        return self.trunk(obs)

    def quantiles(self, feat: jax.Array, taus: jax.Array) -> jax.Array:
        i = jnp.arange(1, self.embedding_dim + 1, dtype=jnp.float32)
        cos = jnp.cos(jnp.pi * taus[..., None] * i)  # [B, K, E]
        phi = nn.relu(self.phi(cos))  # [B, K, F]
        x = feat[:, None, :] * phi
        x = nn.relu(self.head1(x))
        return self.head2(x)  # [B, K, A]

    def __call__(self, obs: jax.Array, taus: jax.Array) -> jax.Array:
        return self.quantiles(self.features(obs), taus)
