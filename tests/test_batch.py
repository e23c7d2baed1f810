"""Batch semantics tests (mirrors the applicable parts of the reference's
``test/base/test_batch.py``: construction/parse rules, nested indexing,
cat/stack, split, pytree round-trips)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.data.batch import Batch


def test_construction_and_access():
    b = Batch(obs=np.zeros((4, 3)), act=[1, 2, 3, 4], nested={"x": np.ones(4)})
    assert isinstance(b.nested, Batch)
    assert b.act.shape == (4,)
    assert "obs" in b and "missing" not in b
    assert set(b.keys()) == {"obs", "act", "nested"}
    with pytest.raises(AttributeError):
        _ = b.missing
    b.new_key = 7.0
    assert np.asarray(b.new_key) == 7.0


def test_scalar_promotion_and_ragged_rejection():
    b = Batch(x=1, y=2.5)
    assert b.x.shape == ()
    with pytest.raises(TypeError):
        Batch(z=[[1, 2], [3]])


def test_indexing_distributes():
    b = Batch(obs=np.arange(12).reshape(4, 3), nested=Batch(v=np.arange(4)))
    s = b[1:3]
    assert s.obs.shape == (2, 3)
    assert np.array_equal(np.asarray(s.nested.v), [1, 2])
    one = b[0]
    assert one.obs.shape == (3,)
    idx = np.array([0, 2])
    assert b[idx].obs.shape == (2, 3)


def test_len_and_shape():
    b = Batch(a=np.zeros((5, 2)), c=Batch(d=np.zeros((5, 7))))
    assert len(b) == 5
    assert b.shape == (5,)
    b2 = Batch(a=np.zeros((5, 2)), b=np.zeros((5, 2, 4)))
    assert b2.shape == (5, 2)
    with pytest.raises(TypeError):
        len(Batch())


def test_cat_and_stack():
    b1 = Batch(x=np.ones((2, 3)), n=Batch(y=np.zeros(2)))
    b2 = Batch(x=np.zeros((3, 3)), n=Batch(y=np.ones(3)))
    c = Batch.cat([b1, b2])
    assert c.x.shape == (5, 3)
    assert c.n.y.shape == (5,)
    s = Batch.stack([b1, b1])
    assert s.x.shape == (2, 2, 3)


def test_split():
    b = Batch(x=np.arange(10))
    parts = b.split(3, shuffle=False)
    assert [len(p) for p in parts] == [3, 3, 3, 1]
    parts = b.split(3, shuffle=False, merge_last=True)
    assert [len(p) for p in parts] == [3, 3, 4]
    # shuffled split is a permutation
    parts = b.split(5, seed=0)
    got = np.sort(np.concatenate([np.asarray(p.x) for p in parts]))
    assert np.array_equal(got, np.arange(10))


def test_pytree_roundtrip_and_jit():
    b = Batch(x=jnp.ones((4, 2)), n=Batch(y=jnp.zeros(4)))
    leaves, treedef = jax.tree_util.tree_flatten(b)
    b2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert b == b2

    @jax.jit
    def f(batch):
        return jax.tree.map(lambda v: v + 1, batch)

    out = f(b)
    assert np.allclose(np.asarray(out.x), 2.0)
    assert isinstance(out, Batch)


def test_setitem_slice():
    b = Batch(x=np.zeros((4, 2)))
    b[1:3] = Batch(x=np.ones((2, 2)))
    assert np.allclose(np.asarray(b.x)[1:3], 1.0)
    assert np.allclose(np.asarray(b.x)[0], 0.0)
    # jax-backed leaves rebind functionally
    bj = Batch(x=jnp.zeros((4, 2)))
    bj[0] = Batch(x=jnp.ones(2))
    assert np.allclose(np.asarray(bj.x)[0], 1.0)


def test_to_jax_numpy():
    b = Batch(x=np.ones(3)).to_jax()
    assert isinstance(b.x, jax.Array)
    b = b.to_numpy()
    assert isinstance(b.x, np.ndarray)


def test_cat_zero_pads_missing_keys():
    """Missing keys are zero-filled on concatenation (reference
    ``batch.py:764`` padding semantics)."""
    b1 = Batch(x=np.ones((2, 3)), extra=np.ones(2))
    b2 = Batch(x=np.zeros((3, 3)))
    c = Batch.cat([b1, b2])
    assert c.x.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(c.extra), [1, 1, 0, 0, 0])
    # nested missing sub-batch
    b3 = Batch(x=np.ones((2, 3)), n=Batch(y=np.ones((2, 4))))
    b4 = Batch(x=np.zeros((1, 3)))
    c2 = Batch.cat([b3, b4])
    assert c2.n.y.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(c2.n.y)[2], 0.0)
