"""Convolutional encoders and Q-heads for pixel observations.

TPU-native counterpart of the reference's Atari nets
(``examples/atari/atari_network.py``: the DeepMind/Nature DQN CNN and its
dueling / distributional variants).  Convolutions are where the MXU earns
its keep: encoders default to bfloat16 compute with float32 params and
float32 outputs (losses/targets stay full precision), which doubles the
effective MXU throughput at no observed learning cost for these tasks.

Two encoder scales:
- :class:`MinAtarCNN` — one 3x3x16 conv + 128-dense for 10x10xC MinAtar
  grids (matches the MinAtar paper's network).
- :class:`NatureCNN` — the classic 8x8s4/4x4s2/3x3s1 + 512-dense stack for
  84x84 frame-stacked Atari-scale inputs.

Heads mirror ``networks/common.py``: plain Q, dueling Q, and the encoders
compose with the distributional heads (C51/QRDQN/IQN) by passing
``features_fn``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "MinAtarCNN",
    "NatureCNN",
    "ConvQNet",
    "ConvDuelingQNet",
    "ConvValueNet",
    "ConvQRDQNNet",
]


def _to_hwc(x: jax.Array, layout: str = "auto") -> jax.Array:
    """Normalize pixel layouts to [B,H,W,C']:

    - [B,H,W,C]: channels-last already (MinAtar grids);
    - [B,S,H,W]: channel-first stack of GRAYSCALE frames — the Atari
      buffer's stacked-gather layout (reference frame-stack is
      channel-first, ``atari_wrapper.py:341``) — stack becomes channels;
    - [B,S,H,W,C]: stacked multi-channel frames, stack folded into
      channels.

    ``layout`` disambiguates the two 4-D forms: ``"hwc"`` (channels
    last), ``"chw"`` (channel/stack first), or ``"auto"`` — a channel
    axis is small (<= 8) while a width axis is not (84 for Atari warps),
    so auto treats ``last dim > 8`` as channel-first.  Pass the explicit
    layout for channels-last inputs with more than 8 feature planes.
    """
    if x.ndim == 5:
        b, s, h, w, c = x.shape
        x = jnp.moveaxis(x, 1, -2).reshape(b, h, w, s * c)
    elif x.ndim == 4:
        chw = layout == "chw" or (layout == "auto" and x.shape[-1] > 8)
        if chw:
            x = jnp.moveaxis(x, 1, -1)  # [B,S,H,W] -> [B,H,W,S]
    return x


class MinAtarCNN(nn.Module):
    """MinAtar-scale encoder: 3x3x16 conv + dense(128), ReLU.

    ``compute_dtype=bfloat16`` keeps the conv and matmul on the MXU's fast
    path; parameters remain float32.
    """

    hidden: int = 128
    channels: int = 16
    compute_dtype: jnp.dtype | None = jnp.bfloat16
    layout: str = "auto"  # see _to_hwc

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _to_hwc(x, self.layout).astype(self.compute_dtype or jnp.float32)
        x = nn.Conv(self.channels, (3, 3), dtype=self.compute_dtype)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.hidden, dtype=self.compute_dtype)(x)
        return nn.relu(x).astype(jnp.float32)


class NatureCNN(nn.Module):
    """DeepMind Nature-DQN encoder (84x84 stacked frames -> 512 features)."""

    hidden: int = 512
    compute_dtype: jnp.dtype | None = jnp.bfloat16
    layout: str = "auto"  # see _to_hwc

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _to_hwc(x, self.layout).astype(self.compute_dtype or jnp.float32)
        for ch, k, s in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
            x = nn.Conv(ch, (k, k), strides=(s, s), padding="VALID",
                        dtype=self.compute_dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.hidden, dtype=self.compute_dtype)(x)
        return nn.relu(x).astype(jnp.float32)


class ConvQNet(nn.Module):
    """Pixel obs -> Q-values: encoder + linear head (Atari ``DQN`` net)."""

    num_actions: int
    encoder: str = "minatar"  # "minatar" | "nature"
    encoder_kwargs: dict | None = None

    def _encoder(self) -> nn.Module:
        kw = self.encoder_kwargs or {}
        return {"minatar": MinAtarCNN, "nature": NatureCNN}[self.encoder](**kw)

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        feat = self._encoder()(obs)
        return nn.Dense(self.num_actions)(feat)


class ConvValueNet(nn.Module):
    """Pixel obs -> scalar state value V(s) (on-policy conv critic)."""

    encoder: str = "minatar"
    encoder_kwargs: dict | None = None

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        kw = self.encoder_kwargs or {}
        feat = {"minatar": MinAtarCNN, "nature": NatureCNN}[self.encoder](**kw)(obs)
        return nn.Dense(1)(feat).squeeze(-1)


class ConvQRDQNNet(nn.Module):
    """Pixel obs -> per-action quantile values ``[B, A, K]``: conv encoder
    + QRDQN head (the reference's Atari QRDQN net,
    ``examples/atari/atari_network.py`` QRDQN class)."""

    num_actions: int
    num_quantiles: int = 200
    encoder: str = "minatar"
    encoder_kwargs: dict | None = None

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        kw = self.encoder_kwargs or {}
        feat = {"minatar": MinAtarCNN, "nature": NatureCNN}[self.encoder](**kw)(obs)
        out = nn.Dense(self.num_actions * self.num_quantiles)(feat)
        return out.reshape(obs.shape[0], self.num_actions, self.num_quantiles)


class ConvDuelingQNet(nn.Module):
    """Dueling head over a conv encoder (Atari dueling DQN)."""

    num_actions: int
    encoder: str = "minatar"
    encoder_kwargs: dict | None = None

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        kw = self.encoder_kwargs or {}
        enc = {"minatar": MinAtarCNN, "nature": NatureCNN}[self.encoder](**kw)
        feat = enc(obs)
        v = nn.Dense(1)(feat)
        a = nn.Dense(self.num_actions)(feat)
        return v + a - a.mean(axis=-1, keepdims=True)
