"""Device-resident sum tree for prioritized replay.

TPU-native replacement for the reference's numba ``SegmentTree``
(``tianshou/data/utils/segtree.py:5-134``): the tree is a single
``[2 * capacity]`` f32 array in HBM (heap layout, root at index 1, leaves at
``[capacity, 2*capacity)``); batched priority updates recompute ancestor
sums level by level (gather + scatter per level, log2(capacity) levels), and
inverse-CDF sampling (``get_prefix_sum_idx`` ``segtree.py:113-134``) is a
vectorized root-to-leaf descent — all pure jnp, so PER sampling runs inside
the jitted update step with zero host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["segtree_init", "segtree_update", "segtree_total", "segtree_sample"]


def _round_up_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def segtree_init(capacity: int) -> jax.Array:
    """Zeroed sum tree for ``capacity`` leaves (padded to a power of two)."""
    cap = _round_up_pow2(capacity)
    return jnp.zeros((2 * cap,), jnp.float32)


def segtree_capacity(tree: jax.Array) -> int:
    return tree.shape[0] // 2


def segtree_update(tree: jax.Array, idx: jax.Array, values: jax.Array) -> jax.Array:
    """Set ``tree[leaf idx] = values`` (batched) and repair ancestor sums.

    Duplicate indices are safe: ancestors are *recomputed* from their
    children rather than delta-propagated, so the final leaf value (XLA
    scatter order for duplicates) is what ancestors reflect.
    """
    cap = segtree_capacity(tree)
    node = idx.astype(jnp.int32) + cap
    tree = tree.at[node].set(values.astype(jnp.float32))
    levels = cap.bit_length() - 1  # log2(cap)
    for _ in range(levels):
        node = node >> 1
        child_sum = tree[2 * node] + tree[2 * node + 1]
        tree = tree.at[node].set(child_sum)
    return tree


def segtree_total(tree: jax.Array) -> jax.Array:
    return tree[1]


def segtree_sample(tree: jax.Array, u: jax.Array) -> jax.Array:
    """Vectorized inverse-CDF descent: for each scalar ``u`` in
    ``[0, total)`` return the leaf index whose prefix-sum interval contains
    it (reference ``get_prefix_sum_idx``)."""
    cap = segtree_capacity(tree)
    node = jnp.ones_like(u, dtype=jnp.int32)
    levels = cap.bit_length() - 1

    def body(i, carry):
        node, u = carry
        left = 2 * node
        left_sum = tree[left]
        go_right = u >= left_sum
        node = jnp.where(go_right, left + 1, left)
        u = jnp.where(go_right, u - left_sum, u)
        return node, u

    node, _ = jax.lax.fori_loop(0, levels, body, (node, u.astype(jnp.float32)))
    return node - cap
