"""Batch edge-case suite: nested cat/stack padding, aliasing, indexing and
split corner cases — the behavioral net of the reference's
``test/base/test_batch.py`` (751 lines) ported to the pytree Batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.data.batch import Batch


# ---------------------------------------------------------------------------
# construction / value parsing
# ---------------------------------------------------------------------------
def test_nested_dict_promotes_to_batch():
    b = Batch(info={"a": np.zeros(3), "deep": {"x": np.ones(3)}})
    assert isinstance(b.info, Batch)
    assert isinstance(b.info.deep, Batch)
    assert b.info.deep.x.shape == (3,)


def test_scalar_and_list_promotion_dtypes():
    b = Batch(i=3, f=1.5, flag=True, lst=[1, 2, 3])
    assert b.i.dtype.kind == "i" and b.i.shape == ()
    assert b.f.dtype.kind == "f"
    assert b.flag.dtype == np.bool_
    assert b.lst.shape == (3,)


def test_ragged_and_object_sequences_rejected():
    with pytest.raises(TypeError):
        Batch(x=[[1, 2], [3]])
    with pytest.raises(TypeError):
        Batch(x=[object(), object()])
    with pytest.raises(TypeError):
        Batch(x="a string is not an array")


def test_copy_constructor_is_shallow_dict_copy():
    """Batch(b) copies the key map but aliases the leaf arrays (pytree
    semantics: leaves are values, containers are structure)."""
    a = np.zeros(3)
    b1 = Batch(x=a)
    b2 = Batch(b1)
    b2.y = np.ones(3)
    assert "y" not in b1  # key map independent
    b2.x[0] = 7.0
    assert b1.x[0] == 7.0  # leaf aliased


def test_getattr_missing_raises_attribute_error():
    b = Batch(x=np.zeros(2))
    with pytest.raises(AttributeError):
        _ = b.nope
    # and hasattr-style probing works (no KeyError leak)
    assert not hasattr(b, "nope")


def test_delattr_and_delitem():
    b = Batch(x=np.zeros(2), y=np.ones(2))
    del b.x
    assert "x" not in b
    del b["y"]
    assert b.is_empty()
    with pytest.raises(AttributeError):
        del b.x


# ---------------------------------------------------------------------------
# len / shape
# ---------------------------------------------------------------------------
def test_len_is_min_over_leaves():
    b = Batch(x=np.zeros((5, 2)), y=np.zeros((3,)))
    assert len(b) == 3


def test_len_raises_on_scalar_leaf_and_empty():
    with pytest.raises(TypeError):
        len(Batch(x=np.asarray(1.0)))
    with pytest.raises(TypeError):
        len(Batch())
    # an empty nested batch is skipped, not counted
    b = Batch(x=np.zeros((4, 2)), sub=Batch())
    assert len(b) == 4


def test_shape_common_prefix():
    b = Batch(x=np.zeros((4, 2, 7)), y=np.zeros((4, 2, 3)))
    assert b.shape == (4, 2)
    b2 = Batch(x=np.zeros((4, 2)), y=np.zeros((5, 2)))
    assert b2.shape == ()
    assert Batch().shape == ()


# ---------------------------------------------------------------------------
# indexing
# ---------------------------------------------------------------------------
def test_index_scalar_int_drops_leading_dim():
    b = Batch(x=np.arange(12).reshape(4, 3), sub=Batch(y=np.arange(4)))
    row = b[2]
    assert row.x.shape == (3,)
    assert row.sub.y == 2


def test_index_bool_mask_and_fancy():
    b = Batch(x=np.arange(5), y=np.arange(5) * 10)
    m = np.array([True, False, True, False, True])
    np.testing.assert_array_equal(b[m].x, [0, 2, 4])
    np.testing.assert_array_equal(b[np.array([3, 1])].y, [30, 10])


def test_index_negative_and_slice_step():
    b = Batch(x=np.arange(6))
    assert b[-1].x == 5
    np.testing.assert_array_equal(b[::2].x, [0, 2, 4])
    np.testing.assert_array_equal(b[::-1].x, [5, 4, 3, 2, 1, 0])


def test_setitem_slice_mixed_numpy_jax_leaves():
    b = Batch(n=np.zeros(4))
    b["j"] = jnp.zeros(4)
    val = Batch(n=np.ones(2), j=jnp.ones(2))
    b[1:3] = val
    np.testing.assert_array_equal(b.n, [0, 1, 1, 0])
    np.testing.assert_array_equal(np.asarray(b.j), [0, 1, 1, 0])


def test_setitem_slice_nested():
    b = Batch(sub=Batch(x=np.zeros(4)))
    b[::2] = Batch(sub=Batch(x=np.ones(2)))
    np.testing.assert_array_equal(b.sub.x, [1, 0, 1, 0])


def test_setitem_slice_requires_batch_value():
    b = Batch(x=np.zeros(4))
    with pytest.raises(TypeError):
        b[1:3] = np.ones(2)


# ---------------------------------------------------------------------------
# cat: zero-padding of missing keys, including nested
# ---------------------------------------------------------------------------
def test_cat_basic_and_empty_filtering():
    a = Batch(x=np.ones((2, 3)))
    b = Batch(x=np.zeros((3, 3)))
    c = Batch.cat([a, Batch(), b])
    assert c.x.shape == (5, 3)
    assert Batch.cat([]).is_empty()
    assert Batch.cat([Batch(), Batch()]).is_empty()


def test_cat_pads_missing_top_level_key():
    a = Batch(x=np.ones((2, 3)), y=np.ones(2))
    b = Batch(x=np.zeros((3, 3)))  # no y
    c = Batch.cat([a, b])
    np.testing.assert_array_equal(c.y, [1, 1, 0, 0, 0])


def test_cat_pads_missing_nested_key():
    """Reference cat_ semantics (batch.py:764): zero-pad at ANY nesting
    level, aligning sub-batches with partially overlapping keys."""
    a = Batch(x=np.ones(2), info=Batch(p=np.ones(2)))
    b = Batch(x=np.zeros(3), info=Batch(q=np.full(3, 5.0)))
    c = Batch.cat([a, b])
    np.testing.assert_array_equal(c.info.p, [1, 1, 0, 0, 0])
    np.testing.assert_array_equal(c.info.q, [0, 0, 5, 5, 5])


def test_cat_pads_entirely_missing_nested_batch():
    a = Batch(x=np.ones(2), info=Batch(p=np.ones((2, 4))))
    b = Batch(x=np.zeros(3))  # no info at all
    c = Batch.cat([a, b])
    assert c.info.p.shape == (5, 4)
    np.testing.assert_array_equal(c.info.p[2:], np.zeros((3, 4)))


def test_cat_three_way_nested_union():
    a = Batch(info=Batch(p=np.ones(1)), x=np.ones(1))
    b = Batch(info=Batch(q=np.ones(2) * 2), x=np.ones(2))
    c = Batch(info=Batch(r=np.ones(1) * 3), x=np.ones(1))
    out = Batch.cat([a, b, c])
    assert set(out.info.keys()) == {"p", "q", "r"}
    np.testing.assert_array_equal(out.info.p, [1, 0, 0, 0])
    np.testing.assert_array_equal(out.info.q, [0, 2, 2, 0])
    np.testing.assert_array_equal(out.info.r, [0, 0, 0, 3])


def test_cat_axis1():
    a = Batch(x=np.ones((2, 3)))
    b = Batch(x=np.zeros((2, 2)))
    assert Batch.cat([a, b], axis=1).x.shape == (2, 5)


def test_cat_preserves_jax_leaves():
    a = Batch(x=jnp.ones((2, 3)))
    b = Batch(x=jnp.zeros((3, 3)))
    c = Batch.cat([a, b])
    assert isinstance(c.x, jax.Array)


# ---------------------------------------------------------------------------
# stack
# ---------------------------------------------------------------------------
def test_stack_basic_and_axis():
    rows = [Batch(x=np.full(3, i), sub=Batch(y=np.asarray(float(i)))) for i in range(4)]
    s0 = Batch.stack(rows)
    assert s0.x.shape == (4, 3)
    np.testing.assert_array_equal(s0.sub.y, [0, 1, 2, 3])
    vec_rows = [Batch(x=np.full(3, i)) for i in range(4)]
    s1 = Batch.stack(vec_rows, axis=1)
    assert s1.x.shape == (3, 4)


def test_stack_empty_list():
    assert Batch.stack([]).is_empty()


# ---------------------------------------------------------------------------
# split
# ---------------------------------------------------------------------------
def test_split_sizes_and_content_no_shuffle():
    b = Batch(x=np.arange(10))
    parts = b.split(3, shuffle=False)
    assert [len(p) for p in parts] == [3, 3, 3, 1]
    np.testing.assert_array_equal(parts[0].x, [0, 1, 2])
    np.testing.assert_array_equal(parts[-1].x, [9])


def test_split_merge_last():
    b = Batch(x=np.arange(10))
    parts = b.split(3, shuffle=False, merge_last=True)
    assert [len(p) for p in parts] == [3, 3, 4]
    np.testing.assert_array_equal(parts[-1].x, [6, 7, 8, 9])
    # exact division: merge_last is a no-op
    parts = Batch(x=np.arange(9)).split(3, shuffle=False, merge_last=True)
    assert [len(p) for p in parts] == [3, 3, 3]
    # size >= n: single chunk
    parts = Batch(x=np.arange(4)).split(100, shuffle=False)
    assert len(parts) == 1 and len(parts[0]) == 4


def test_split_shuffle_is_permutation_and_seedable():
    b = Batch(x=np.arange(20))
    p1 = Batch.cat(b.split(6, shuffle=True, seed=0))
    assert sorted(p1.x.tolist()) == list(range(20))
    p2 = Batch.cat(b.split(6, shuffle=True, seed=0))
    np.testing.assert_array_equal(p1.x, p2.x)  # deterministic under seed
    pk = Batch.cat(b.split(6, shuffle=True, key=jax.random.key(3)))
    assert sorted(pk.x.tolist()) == list(range(20))


# ---------------------------------------------------------------------------
# pytree behavior
# ---------------------------------------------------------------------------
def test_key_order_does_not_affect_treedef():
    b1 = Batch(a=np.zeros(2), z=np.ones(2))
    b2 = Batch(z=np.ones(2), a=np.zeros(2))
    t1 = jax.tree_util.tree_structure(b1)
    t2 = jax.tree_util.tree_structure(b2)
    assert t1 == t2  # sorted-key flattening


def test_tree_map_and_key_paths():
    b = Batch(x=np.ones((2, 3)), sub=Batch(y=np.ones(2)))
    doubled = jax.tree.map(lambda v: v * 2, b)
    assert isinstance(doubled, Batch)
    np.testing.assert_array_equal(doubled.sub.y, [2, 2])
    paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(b)
    }
    assert paths == {"['x']", "['sub']['y']"}


def test_batch_through_scan_carry():
    def body(carry, _):
        return Batch(x=carry.x + 1), carry.x

    init = Batch(x=jnp.zeros(2))
    out, hist = jax.lax.scan(body, init, jnp.arange(3))
    np.testing.assert_array_equal(np.asarray(out.x), [3, 3])
    assert hist.shape == (3, 2)


def test_vmap_over_batch():
    b = Batch(x=jnp.arange(6.0).reshape(3, 2))
    out = jax.vmap(lambda row: Batch(y=row.x.sum()))(b)
    np.testing.assert_array_equal(np.asarray(out.y), [1, 5, 9])


# ---------------------------------------------------------------------------
# equality / repr
# ---------------------------------------------------------------------------
def test_eq_deep_and_mismatch():
    a = Batch(x=np.ones(2), sub=Batch(y=np.zeros(2)))
    assert a == Batch(x=np.ones(2), sub=Batch(y=np.zeros(2)))
    assert a != Batch(x=np.ones(2), sub=Batch(y=np.ones(2)))
    assert a != Batch(x=np.ones(2))  # key set differs
    assert a != Batch(x=np.ones(3), sub=Batch(y=np.zeros(2)))  # shape differs


def test_eq_nan_aware():
    a = Batch(x=np.asarray([np.nan, 1.0]))
    assert a == Batch(x=np.asarray([np.nan, 1.0]))


def test_repr_mentions_keys_and_shapes():
    r = repr(Batch(obs=np.zeros((4, 3)), sub=Batch(y=np.zeros(4))))
    assert "obs" in r and "(4, 3)" in r and "sub" in r
