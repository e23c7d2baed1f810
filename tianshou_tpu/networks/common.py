"""Core network modules (flax.linen).

TPU-native counterparts of the reference's torch nets in
``tianshou/utils/net/common.py`` (``MLP:47``, ``Net:159``, ``Recurrent:290``,
``EnsembleLinear:416``, ``BranchingNet:452``).  Matmul-heavy paths default to
float32 params with optional bfloat16 compute (MXU-friendly); ensembles get
their parallelism from a leading ensemble axis + ``nn.vmap`` rather than
batched ``torch.einsum``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "MLP",
    "QNet",
    "QNetEnsemble",
    "DuelingQNet",
    "RecurrentQNet",
    "EnsembleMLP",
    "BranchingQNet",
]


class MLP(nn.Module):
    """Plain MLP: hidden layers with activation, optional linear output."""

    hidden_sizes: Sequence[int]
    output_dim: int | None = None
    activation: Callable = nn.relu
    kernel_init: Callable = nn.initializers.orthogonal(jnp.sqrt(2.0))
    output_init: Callable = nn.initializers.orthogonal(1.0)
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.reshape(x.shape[0], -1)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        for h in self.hidden_sizes:
            x = nn.Dense(h, kernel_init=self.kernel_init, dtype=self.compute_dtype)(x)
            x = self.activation(x)
        if self.output_dim is not None:
            x = nn.Dense(
                self.output_dim, kernel_init=self.output_init, dtype=self.compute_dtype
            )(x)
        return x.astype(jnp.float32)


class QNet(nn.Module):
    """State -> Q-values for each discrete action (reference ``Net``).

    ``compute_dtype=jnp.bfloat16`` runs the matmuls in bf16 on the MXU
    (float32 params, float32 output — mixed precision, not quantization).
    """

    hidden_sizes: Sequence[int]
    num_actions: int
    activation: Callable = nn.relu
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        return MLP(
            self.hidden_sizes, self.num_actions, activation=self.activation,
            compute_dtype=self.compute_dtype,
        )(obs)


class QNetEnsemble(nn.Module):
    """K independent Q nets: obs -> [K, B, A] (DiscreteSAC twin critics)."""

    hidden_sizes: Sequence[int]
    num_actions: int
    num_critics: int = 2
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        vq = nn.vmap(
            QNet,
            in_axes=None,
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            axis_size=self.num_critics,
        )
        return vq(
            self.hidden_sizes, self.num_actions,
            compute_dtype=self.compute_dtype,
        )(obs)


class DuelingQNet(nn.Module):
    """Dueling architecture: Q = V + A - mean(A) (reference dueling ``Net``)."""

    hidden_sizes: Sequence[int]
    num_actions: int
    activation: Callable = nn.relu
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        feat = MLP(
            self.hidden_sizes, None, activation=self.activation,
            compute_dtype=self.compute_dtype,
        )(obs)
        v = nn.Dense(1)(feat)
        a = nn.Dense(self.num_actions)(feat)
        return v + a - a.mean(axis=-1, keepdims=True)


class RecurrentQNet(nn.Module):
    """LSTM-backed Q net over stacked frames ``[B, L, obs_dim]``
    (reference ``Recurrent``, ``utils/net/common.py:290-372``).

    ``carry`` is an explicit ``(c, h)`` pair of ``[B, hidden]`` arrays so it
    can live in the collector's ``CollectState`` and flow through the
    rollout scan; :meth:`init_carry` builds the zero state.
    """

    hidden_size: int
    num_actions: int

    @nn.compact
    def __call__(
        self, obs: jax.Array, carry: tuple[jax.Array, jax.Array]
    ) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
        if obs.ndim == 2:
            obs = obs[:, None, :]
        x = nn.Dense(self.hidden_size)(obs)
        cell = nn.OptimizedLSTMCell(self.hidden_size)
        y = None
        for t in range(x.shape[1]):
            carry, y = cell(carry, x[:, t])
        q = nn.Dense(self.num_actions)(y)
        return q, carry

    def init_carry(self, batch_size: int) -> tuple[jax.Array, jax.Array]:
        z = jnp.zeros((batch_size, self.hidden_size), jnp.float32)
        return (z, z)


class EnsembleMLP(nn.Module):
    """K independent MLPs evaluated in one batched matmul via ``nn.vmap``
    (reference ``EnsembleLinear`` used by REDQ)."""

    ensemble_size: int
    hidden_sizes: Sequence[int]
    output_dim: int
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        vmlp = nn.vmap(
            MLP,
            in_axes=None,
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            axis_size=self.ensemble_size,
        )
        return vmlp(
            self.hidden_sizes, self.output_dim,
            compute_dtype=self.compute_dtype,
        )(x)  # [K, B, out]


class BranchingQNet(nn.Module):
    """Branching dueling Q net for MultiDiscrete actions (reference
    ``BranchingNet``, ``utils/net/common.py:452``; BDQ arXiv 1711.08946)."""

    hidden_sizes: Sequence[int]
    num_branches: int
    actions_per_branch: int
    value_hidden: Sequence[int] = (128,)
    action_hidden: Sequence[int] = (128,)

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        feat = MLP(self.hidden_sizes, None)(obs)
        v = MLP(self.value_hidden, 1)(feat)[:, None, :]  # [B, 1, 1]
        branch = nn.vmap(
            MLP,
            in_axes=None,
            out_axes=1,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            axis_size=self.num_branches,
        )
        a = branch(self.action_hidden, self.actions_per_branch)(feat)  # [B, nb, apb]
        return v + a - a.mean(axis=-1, keepdims=True)  # [B, nb, apb]
