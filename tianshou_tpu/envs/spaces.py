"""Minimal space specs for functional JAX environments.

Replaces the reference's dependence on ``gymnasium.spaces`` for its pure-env
metadata (shape/dtype/bounds extraction, cf. ``tianshou/utils/space_info.py``)
with tiny static dataclasses that are hashable (usable as static args under
``jit``) and can sample on-device with explicit PRNG keys.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Discrete", "Box", "MultiDiscrete", "Space"]


@dataclasses.dataclass(frozen=True)
class Discrete:
    n: int

    @property
    def shape(self) -> tuple[int, ...]:
        return ()

    @property
    def dtype(self):
        return jnp.int32

    def sample(self, key: jax.Array, batch_shape: tuple[int, ...] = ()) -> jax.Array:
        return jax.random.randint(key, batch_shape, 0, self.n, dtype=jnp.int32)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return bool(np.all((x >= 0) & (x < self.n)))


@dataclasses.dataclass(frozen=True)
class MultiDiscrete:
    nvec: tuple[int, ...]

    @property
    def shape(self) -> tuple[int, ...]:
        return (len(self.nvec),)

    @property
    def dtype(self):
        return jnp.int32

    def sample(self, key: jax.Array, batch_shape: tuple[int, ...] = ()) -> jax.Array:
        nvec = jnp.asarray(self.nvec, jnp.int32)
        u = jax.random.uniform(key, batch_shape + self.shape)
        return jnp.floor(u * nvec).astype(jnp.int32)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return bool(np.all((x >= 0) & (x < np.asarray(self.nvec))))


@dataclasses.dataclass(frozen=True)
class Box:
    low: tuple[float, ...] | float
    high: tuple[float, ...] | float
    shape: tuple[int, ...]
    # dtype omitted: always float32 on TPU compute path

    @property
    def dtype(self):
        return jnp.float32

    def _bound_arr(self, bound) -> jax.Array:
        """Materialize a stored bound (scalar or flattened tuple) to
        ``self.shape``.  Per-dim bounds are stored as a flat tuple regardless
        of the Box's rank, so reshape when the sizes match."""
        a = jnp.asarray(bound, jnp.float32)
        if a.size == int(np.prod(self.shape)) and self.shape:
            return a.reshape(self.shape)
        return jnp.broadcast_to(a, self.shape)

    def low_arr(self) -> jax.Array:
        return self._bound_arr(self.low)

    def high_arr(self) -> jax.Array:
        return self._bound_arr(self.high)

    def sample(self, key: jax.Array, batch_shape: tuple[int, ...] = ()) -> jax.Array:
        lo, hi = self.low_arr(), self.high_arr()
        u = jax.random.uniform(key, batch_shape + self.shape)
        return lo + u * (hi - lo)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return bool(
            np.all(x >= np.asarray(self.low) - 1e-6)
            and np.all(x <= np.asarray(self.high) + 1e-6)
        )


Space = Discrete | Box | MultiDiscrete
