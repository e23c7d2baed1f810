"""Small pytree helpers used across the framework.

These replace the ad-hoc per-leaf loops of the reference's ``Batch`` internals
(``tianshou/data/batch.py``) with ``jax.tree_util`` one-liners, usable both on
``Batch`` objects and plain dict/dataclass pytrees.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "tree_slice",
    "tree_where",
    "tree_zeros_like_leading",
    "tree_dynamic_update",
    "tree_leading_shape",
]


def tree_slice(tree: Any, index: Any) -> Any:
    """Index every leaf of ``tree`` with ``index``."""
    return jax.tree.map(lambda x: x[index], tree)


def tree_where(cond: jax.Array, a: Any, b: Any) -> Any:
    """Select ``a`` where ``cond`` else ``b``, broadcasting ``cond`` over
    each leaf's trailing dimensions (cond has shape = leading dims)."""

    def _sel(x, y):
        c = cond.reshape(cond.shape + (1,) * (jnp.ndim(x) - cond.ndim))
        return jnp.where(c, x, y)

    return jax.tree.map(_sel, a, b)


def tree_zeros_like_leading(example: Any, leading: tuple[int, ...]) -> Any:
    """Allocate zeros shaped ``leading + leaf.shape`` for each leaf of a
    per-item ``example`` pytree (the buffer pre-allocation primitive,
    replacing reference ``create_value`` ``batch.py:96``)."""
    return jax.tree.map(
        lambda x: jnp.zeros(tuple(leading) + jnp.shape(x), dtype=jnp.asarray(x).dtype),
        example,
    )


def tree_dynamic_update(tree: Any, value: Any, index: Any) -> Any:
    """Functionally write ``value`` into ``tree`` at ``index`` on every leaf."""
    return jax.tree.map(lambda t, v: t.at[index].set(v), tree, value)


def tree_leading_shape(tree: Any, ndim: int = 1) -> tuple[int, ...]:
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return ()
    return tuple(np.shape(leaves[0])[:ndim])
