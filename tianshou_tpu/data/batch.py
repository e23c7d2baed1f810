"""Batch: a recursive dict-of-arrays container registered as a JAX pytree.

TPU-native re-design of the reference's ``tianshou/data/batch.py`` (``Batch``,
``batch.py:424``).  The reference implements a large dynamic class with
torch/numpy duality; here the same user-facing surface (attribute access,
distributed indexing/slicing, ``cat``/``stack``, ``split`` minibatching,
device moves) is a thin layer over ``jax.tree_util``.  Because ``Batch`` is a
registered pytree with deterministic (sorted-key) structure, it can flow
through ``jit`` / ``lax.scan`` / ``vmap`` unchanged — which is what lets the
collector and replay buffer live entirely on device.

Leaves may be ``jax.Array`` or ``numpy.ndarray`` (host-side collectors use
numpy; jitted code uses jax arrays).  Scalars/lists are promoted to numpy
arrays at construction, mirroring the reference's value-parsing rules
(``batch.py:138``).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Batch"]

_ArrayLike = (np.ndarray, np.generic, jax.Array)


def _parse_value(value: Any) -> Any:
    """Normalize an input value to a Batch or array leaf."""
    if isinstance(value, Batch):
        return value
    if isinstance(value, dict):
        return Batch(value)
    if isinstance(value, _ArrayLike):
        return value
    if isinstance(value, (bool, int, float, complex)):
        return np.asarray(value)
    if isinstance(value, (list, tuple)):
        try:
            arr = np.asarray(value)
        except ValueError as e:
            raise TypeError(
                f"Cannot store ragged sequence in Batch: {value!r}"
            ) from e
        if arr.dtype == object:
            raise TypeError(
                f"Cannot store ragged/object sequence in Batch: {value!r}"
            )
        return arr
    raise TypeError(f"Unsupported value type for Batch: {type(value)}")


@jax.tree_util.register_pytree_with_keys_class
class Batch:
    """Recursive dict of arrays; indexing/slicing distributes over leaves."""

    __slots__ = ("_d",)

    def __init__(self, data: dict[str, Any] | Batch | None = None, **kwargs: Any):
        object.__setattr__(self, "_d", {})
        if isinstance(data, Batch):
            data = dict(data._d)
        if data is not None:
            for k, v in data.items():
                self._d[k] = _parse_value(v)
        for k, v in kwargs.items():
            self._d[k] = _parse_value(v)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten_with_keys(self):
        keys = sorted(self._d)
        children = [(jax.tree_util.DictKey(k), self._d[k]) for k in keys]
        return children, tuple(keys)

    @classmethod
    def tree_unflatten(cls, aux: tuple[str, ...], children: Sequence[Any]):
        obj = object.__new__(cls)
        object.__setattr__(obj, "_d", dict(zip(aux, children)))
        return obj

    # -- mapping interface -------------------------------------------------
    def keys(self):
        return self._d.keys()

    def values(self):
        return self._d.values()

    def items(self):
        return self._d.items()

    def get(self, key: str, default: Any = None) -> Any:
        return self._d.get(key, default)

    def __contains__(self, key: str) -> bool:
        return key in self._d

    def __iter__(self) -> Iterator[str]:
        return iter(self._d)

    # -- attribute access --------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self.__getattribute__("_d")[name]
        except KeyError:
            raise AttributeError(f"Batch has no key {name!r}") from None

    def __setattr__(self, name: str, value: Any) -> None:
        self._d[name] = _parse_value(value)

    def __delattr__(self, name: str) -> None:
        try:
            del self._d[name]
        except KeyError:
            raise AttributeError(name) from None

    # -- indexing ----------------------------------------------------------
    def __getitem__(self, index: Any) -> Any:
        if isinstance(index, str):
            return self._d[index]
        return Batch({k: v[index] for k, v in self._d.items()})

    def __setitem__(self, index: Any, value: Any) -> None:
        if isinstance(index, str):
            self._d[index] = _parse_value(value)
            return
        value = _parse_value(value)
        if not isinstance(value, Batch):
            raise TypeError("Batch slice assignment requires a Batch value")
        for k, leaf in self._d.items():
            sub = value._d[k]
            if isinstance(leaf, Batch):
                leaf[index] = sub
            elif isinstance(leaf, np.ndarray):
                leaf[index] = np.asarray(sub)
            else:  # jax array: functional update, rebind
                self._d[k] = leaf.at[index].set(jnp.asarray(sub))

    def __delitem__(self, key: str) -> None:
        del self._d[key]

    # -- shape / length ----------------------------------------------------
    def __len__(self) -> int:
        lens = []
        for v in self._d.values():
            if isinstance(v, Batch):
                if v.is_empty():
                    continue
                lens.append(len(v))
            elif v.ndim == 0:
                raise TypeError("Batch contains a scalar leaf; it has no len()")
            else:
                lens.append(v.shape[0])
        if not lens:
            raise TypeError("len() of an empty Batch")
        return min(lens)

    @property
    def shape(self) -> tuple[int, ...]:
        """Common leading-shape prefix over all leaves (empty tuple if none)."""
        shapes = [
            np.shape(leaf) for leaf in jax.tree_util.tree_leaves(self)
        ]
        if not shapes:
            return ()
        prefix: list[int] = []
        for dims in zip(*shapes):
            if all(d == dims[0] for d in dims):
                prefix.append(dims[0])
            else:
                break
        return tuple(prefix)

    def is_empty(self, recurse: bool = False) -> bool:
        if not self._d:
            return True
        if not recurse:
            return False
        return all(
            isinstance(v, Batch) and v.is_empty(recurse=True)
            for v in self._d.values()
        )

    # -- conversion --------------------------------------------------------
    def to_jax(self) -> Batch:
        return jax.tree.map(jnp.asarray, self)

    def to_numpy(self) -> Batch:
        return jax.tree.map(np.asarray, self)

    # -- combination -------------------------------------------------------
    @staticmethod
    def _pad_missing(
        batches: list[Batch], lens: list[int] | None = None
    ) -> list[Batch]:
        """Zero-fill keys that only some batches carry — recursively, so
        nested sub-batches with partially overlapping keys align too (the
        reference's cat/stack padding semantics, ``batch.py:764,804``): a
        missing leaf is replaced by zeros shaped like a present one, with
        the leading dim taken from the batch that lacks it."""
        if lens is None:
            lens = [len(b) for b in batches]
        all_keys: dict[str, Any] = {}
        for b in batches:
            for k, v in b.items():
                all_keys.setdefault(k, v)
        out = [Batch(b) for b in batches]
        for k, proto in all_keys.items():
            if isinstance(proto, Batch):
                # align every batch's sub-batch simultaneously (a third
                # batch may carry sub-keys the proto lacks)
                subs = [
                    f._d[k] if isinstance(f._d.get(k), Batch) else Batch()
                    for f in out
                ]
                for f, ps in zip(out, Batch._pad_missing(subs, lens)):
                    f._d[k] = ps
                continue
            for f, n in zip(out, lens):
                if k not in f:
                    f._d[k] = np.zeros(
                        (n,) + np.shape(proto)[1:], np.asarray(proto).dtype
                    )
        return out

    @staticmethod
    def cat(batches: Sequence[Batch], axis: int = 0) -> Batch:
        """Concatenate batches along ``axis``; keys missing from some
        batches are zero-padded (reference ``cat_`` semantics)."""
        batches = [b for b in batches if not b.is_empty(recurse=True)]
        if not batches:
            return Batch()
        batches = Batch._pad_missing(list(batches))
        return jax.tree.map(
            lambda *xs: (
                np.concatenate(xs, axis=axis)
                if all(isinstance(x, (np.ndarray, np.generic)) for x in xs)
                else jnp.concatenate(xs, axis=axis)
            ),
            *batches,
        )

    @staticmethod
    def stack(batches: Sequence[Batch], axis: int = 0) -> Batch:
        batches = list(batches)
        if not batches:
            return Batch()
        return jax.tree.map(
            lambda *xs: (
                np.stack(xs, axis=axis)
                if all(isinstance(x, (np.ndarray, np.generic)) for x in xs)
                else jnp.stack(xs, axis=axis)
            ),
            *batches,
        )

    def split(
        self,
        size: int,
        *,
        shuffle: bool = True,
        merge_last: bool = False,
        key: jax.Array | None = None,
        seed: int | None = None,
    ) -> list[Batch]:
        """Split into minibatches of ``size`` (reference ``batch.py:993``)."""
        n = len(self)
        if shuffle:
            if key is not None:
                perm = np.asarray(jax.random.permutation(key, n))
            else:
                perm = np.random.default_rng(seed).permutation(n)
        else:
            perm = np.arange(n)
        starts = list(range(0, n, size))
        if merge_last and len(starts) > 1 and n - starts[-1] < size:
            starts = starts[:-1]
        out = []
        for i, s in enumerate(starts):
            e = n if (merge_last and i == len(starts) - 1) else min(s + size, n)
            out.append(self[perm[s:e]])
        return out

    # -- misc --------------------------------------------------------------
    def __repr__(self) -> str:
        items = []
        for k in sorted(self._d):
            v = self._d[k]
            if isinstance(v, Batch):
                items.append(f"{k}: {v!r}")
            else:
                items.append(f"{k}: {type(v).__name__}{tuple(np.shape(v))} {np.asarray(v).dtype}")
        inner = ", ".join(items)
        return f"Batch({inner})"

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, Batch):
            return NotImplemented
        if sorted(self._d) != sorted(other._d):
            return False
        for k, v in self._d.items():
            w = other._d[k]
            if isinstance(v, Batch) != isinstance(w, Batch):
                return False
            if isinstance(v, Batch):
                if v != w:
                    return False
            else:
                a, b = np.asarray(v), np.asarray(w)
                if a.shape != b.shape or not np.allclose(
                    a, b, equal_nan=True
                ):
                    return False
        return True

    __hash__ = None  # type: ignore[assignment]
