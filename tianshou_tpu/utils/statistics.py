"""Moving-average and running mean/std statistics.

Counterpart of ``tianshou/utils/statistics.py`` (``MovAvg:7``,
``RunningMeanStd:69``).  ``RunningMeanStdState`` additionally exists as a
pure pytree with functional updates so observation normalization can be
carried through jitted rollout scans (replacing the reference's
``VectorEnvNormObs`` mutable wrapper).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MovAvg", "RunningMeanStd", "RunningMeanStdState", "rms_init", "rms_update", "rms_normalize"]


class MovAvg:
    """Moving average over the last ``size`` scalars, inf/nan-filtered."""

    def __init__(self, size: int = 100):
        self.size = size
        self.cache: list[float] = []

    def add(self, value) -> float:
        arr = np.asarray(value, np.float64).reshape(-1)
        self.cache.extend(float(v) for v in arr if np.isfinite(v))
        if self.size > 0 and len(self.cache) > self.size:
            self.cache = self.cache[-self.size:]
        return self.get()

    def get(self) -> float:
        return float(np.mean(self.cache)) if self.cache else 0.0

    def mean(self) -> float:
        return self.get()

    def std(self) -> float:
        return float(np.std(self.cache)) if self.cache else 0.0


class RunningMeanStd:
    """Welford-style running mean/variance over batches (host-side)."""

    def __init__(self, mean=0.0, std=1.0, clip_max: float | None = 10.0, epsilon: float = 1e-8):
        self.mean = np.asarray(mean, np.float64)
        self.var = np.asarray(std, np.float64) ** 2
        self.count = 0.0
        self.clip_max = clip_max
        self.eps = epsilon

    def update(self, data: np.ndarray) -> None:
        data = np.asarray(data, np.float64)
        batch_mean = data.mean(axis=0)
        batch_var = data.var(axis=0)
        batch_count = data.shape[0]
        delta = batch_mean - self.mean
        total = self.count + batch_count
        new_mean = self.mean + delta * batch_count / total
        m_a = self.var * self.count
        m_b = batch_var * batch_count
        m2 = m_a + m_b + delta**2 * self.count * batch_count / total
        self.mean, self.var, self.count = new_mean, m2 / total, total

    def norm(self, data):
        out = (np.asarray(data) - self.mean) / np.sqrt(self.var + self.eps)
        if self.clip_max is not None:
            out = np.clip(out, -self.clip_max, self.clip_max)
        return out


class RunningMeanStdState(NamedTuple):
    """Pure pytree running statistics (device-side, jittable)."""

    mean: jax.Array
    var: jax.Array
    count: jax.Array


def rms_init(shape: tuple[int, ...]) -> RunningMeanStdState:
    return RunningMeanStdState(
        mean=jnp.zeros(shape), var=jnp.ones(shape), count=jnp.full((), 1e-4)
    )


def rms_update(state: RunningMeanStdState, batch: jax.Array) -> RunningMeanStdState:
    """Parallel-variance merge of a ``[B, ...]`` batch (Chan et al.)."""
    batch_mean = batch.mean(axis=0)
    batch_var = batch.var(axis=0)
    batch_count = batch.shape[0]
    delta = batch_mean - state.mean
    total = state.count + batch_count
    new_mean = state.mean + delta * batch_count / total
    m2 = (
        state.var * state.count
        + batch_var * batch_count
        + delta**2 * state.count * batch_count / total
    )
    return RunningMeanStdState(new_mean, m2 / total, total)


def rms_normalize(
    state: RunningMeanStdState,
    x: jax.Array,
    clip: float | None = 10.0,
    eps: float = 1e-8,
) -> jax.Array:
    out = (x - state.mean) / jnp.sqrt(state.var + eps)
    if clip is not None:
        out = jnp.clip(out, -clip, clip)
    return out
