"""Replay-buffer edge-case suite: wraparound chains, frame stacks across the
ring seam, custom/nested keys, merge overflow and HDF5 custom-key
round-trips — the behavioral net of the reference's
``test/base/test_buffer.py:704-1382`` ported to the pytree ring buffer."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.data.persistence import load_buffer_hdf5, save_buffer_hdf5


def _tr(obs, rew=0.0, terminated=False, truncated=False, **extra):
    """Single-env transition with [1, ...] leaves."""
    return Batch(
        obs=np.asarray([obs], np.float32),
        act=np.asarray([0], np.int32),
        rew=np.asarray([rew], np.float32),
        terminated=np.asarray([terminated]),
        truncated=np.asarray([truncated]),
        obs_next=np.asarray([obs + 0.5], np.float32),
        **extra,
    )


def _fill(buf, episodes, extra_keys=()):
    """Write episodes = [[(obs, terminated), ...], ...] into a fresh state."""
    example = jax.tree.map(lambda x: x[0], _tr(0.0))
    state = buf.init(example)
    for ep in episodes:
        for i, (obs, term) in enumerate(ep):
            state = buf.add(state, _tr(obs, rew=obs, terminated=term))
    return state


# ---------------------------------------------------------------------------
# ring arithmetic across the wraparound seam
# ---------------------------------------------------------------------------
def test_prev_next_across_wraparound():
    """After overwriting old entries, prev/next must respect the moving
    oldest element (reference buffer/base.py:174-190 with a full ring)."""
    buf = ReplayBuffer(capacity=5, num_envs=1)
    # episode A: obs 0..2 (terminated at 2); episode B: obs 3..6 -> wraps
    eps = [[(0.0, False), (1.0, False), (2.0, True)],
           [(3.0, False), (4.0, False), (5.0, False), (6.0, False)]]
    state = _fill(buf, eps)
    # ring now holds (slot: obs) 0:5, 1:6, 2:2(T), 3:3, 4:4 ; cursor=2
    env = jnp.zeros((5,), jnp.int32)
    pos = jnp.arange(5)
    nxt = np.asarray(buf.next_pos(state, env, pos))
    # slot0 (obs5) -> slot1 (obs6, newest): 1; slot1 newest -> stays 1
    # slot2 done -> stays 2; slot3 -> 4; slot4 -> 0 (wraps to obs5)
    np.testing.assert_array_equal(nxt, [1, 1, 2, 4, 0])
    prv = np.asarray(buf.prev_pos(state, env, pos))
    # slot0's prev is slot4 (same episode B, wraps back)
    # slot1's prev is slot0; slot2 is oldest -> stays; slot3's prev slot2 is
    # done -> episode start stays; slot4 -> 3
    np.testing.assert_array_equal(prv, [4, 0, 2, 3, 3])


def test_frame_stack_across_wraparound_seam():
    buf = ReplayBuffer(capacity=5, num_envs=1, stack_num=3)
    eps = [[(0.0, False), (1.0, False), (2.0, True)],
           [(3.0, False), (4.0, False), (5.0, False), (6.0, False)]]
    state = _fill(buf, eps)
    # newest element obs6 sits at slot 1; its 3-stack is [4, 5, 6] and the
    # middle frame obs5 lives on the other side of the ring seam (slot 0)
    stack = np.asarray(
        buf.stacked_obs(state, jnp.asarray([0]), jnp.asarray([1]))
    )[0]
    np.testing.assert_array_equal(stack, [4.0, 5.0, 6.0])


def test_frame_stack_saturation_at_overwritten_oldest():
    """The oldest surviving element must repeat itself, never read frames
    that were overwritten by a newer episode."""
    buf = ReplayBuffer(capacity=4, num_envs=1, stack_num=3)
    eps = [[(0.0, False), (1.0, False), (2.0, False), (3.0, False),
            (4.0, False), (5.0, False)]]  # one long episode, wraps by 2
    state = _fill(buf, eps)
    # ring: slot0:4, slot1:5, slot2:2, slot3:3 ; oldest is slot2 (obs2)
    stack = np.asarray(
        buf.stacked_obs(state, jnp.asarray([0]), jnp.asarray([2]))
    )[0]
    np.testing.assert_array_equal(stack, [2.0, 2.0, 2.0])


def test_nstep_chain_across_wraparound():
    buf = ReplayBuffer(capacity=4, num_envs=1)
    eps = [[(0.0, False), (1.0, False), (2.0, False), (3.0, False),
            (4.0, False)]]  # wraps by 1; rew == obs
    state = _fill(buf, eps)
    # ring: slot0:4, slot1:1, slot2:2, slot3:3 ; sample slot3 with n=2
    rew_chain, done_chain, term = buf.nstep_chain(
        state, jnp.asarray([0]), jnp.asarray([3]), 2
    )
    np.testing.assert_array_equal(np.asarray(rew_chain)[0], [3.0, 4.0])
    np.testing.assert_array_equal(np.asarray(done_chain)[0], [0, 0])
    assert int(term[0]) == 0  # chain crossed the seam to slot 0


def test_sampling_excludes_stale_slots_before_full():
    buf = ReplayBuffer(capacity=8, num_envs=2)
    example = jax.tree.map(lambda x: x[0], _tr(0.0))
    state = buf.init(example)
    # env0 gets 3 entries, env1 gets 1 (via masked writes)
    tr2 = Batch(
        obs=np.asarray([1.0, 9.0], np.float32),
        act=np.asarray([0, 0], np.int32),
        rew=np.zeros(2, np.float32),
        terminated=np.asarray([False, False]),
        truncated=np.asarray([False, False]),
        obs_next=np.zeros(2, np.float32),
    )
    state = buf.add(state, tr2)
    state = buf.add_masked(state, tr2, jnp.asarray([True, False]))
    state = buf.add_masked(state, tr2, jnp.asarray([True, False]))
    env_idx, pos = buf.sample_indices(state, jax.random.key(0), 256)
    env_idx, pos = np.asarray(env_idx), np.asarray(pos)
    assert set(pos[env_idx == 0]) <= {0, 1, 2}
    assert set(pos[env_idx == 1]) <= {0}
    # proportionality: env0 holds 3 of 4 entries
    frac0 = (env_idx == 0).mean()
    assert 0.6 < frac0 < 0.9


# ---------------------------------------------------------------------------
# custom / nested keys
# ---------------------------------------------------------------------------
def test_custom_and_nested_keys_roundtrip():
    """Arbitrary extra keys (incl. nested info batches) are stored, sampled
    and gathered like reserved keys (reference test_custom_key,
    test_buffer.py:1311)."""
    buf = ReplayBuffer(capacity=6, num_envs=1)
    tr = _tr(
        1.0,
        info=Batch(ctr=np.asarray([7], np.int32),
                   deep=Batch(v=np.asarray([[1.0, 2.0]], np.float32))),
        policy=Batch(log_prob=np.asarray([-0.5], np.float32)),
    )
    example = jax.tree.map(lambda x: x[0], tr)
    state = buf.init(example)
    for i in range(4):
        tri = _tr(
            float(i),
            info=Batch(ctr=np.asarray([i], np.int32),
                       deep=Batch(v=np.full((1, 2), i, np.float32))),
            policy=Batch(log_prob=np.asarray([-float(i)], np.float32)),
        )
        state = buf.add(state, tri)
    got = buf.get(state, jnp.asarray([0, 0]), jnp.asarray([1, 3]))
    np.testing.assert_array_equal(np.asarray(got["info"]["ctr"]), [1, 3])
    np.testing.assert_array_equal(
        np.asarray(got["info"]["deep"]["v"]), [[1, 1], [3, 3]]
    )
    np.testing.assert_array_equal(np.asarray(got["policy"]["log_prob"]), [-1, -3])
    assert "done" in got  # derived, not stored
    assert "done" not in state.storage.keys()


def test_hdf5_roundtrip_with_custom_keys(tmp_path):
    buf = ReplayBuffer(capacity=5, num_envs=2)
    tr = Batch(
        obs=np.random.randn(2, 3).astype(np.float32),
        act=np.zeros(2, np.int32),
        rew=np.ones(2, np.float32),
        terminated=np.asarray([False, True]),
        truncated=np.asarray([False, False]),
        obs_next=np.random.randn(2, 3).astype(np.float32),
        info=Batch(deep=Batch(v=np.ones((2, 4), np.float32))),
    )
    example = jax.tree.map(lambda x: x[0], tr)
    state = buf.init(example)
    for _ in range(3):
        state = buf.add(state, tr)
    p = os.path.join(tmp_path, "buf.h5")
    save_buffer_hdf5(p, state)
    loaded = load_buffer_hdf5(p)
    assert set(loaded.storage.keys()) == set(state.storage.keys())
    np.testing.assert_array_equal(
        np.asarray(loaded.storage["info"]["deep"]["v"]),
        np.asarray(state.storage["info"]["deep"]["v"]),
    )
    np.testing.assert_array_equal(np.asarray(loaded.cursor), np.asarray(state.cursor))
    np.testing.assert_array_equal(np.asarray(loaded.size), np.asarray(state.size))
    # loaded state keeps working: sample from it
    got = buf.get(loaded, jnp.asarray([0]), jnp.asarray([1]))
    np.testing.assert_array_equal(np.asarray(got["rew"]), [1.0])


# ---------------------------------------------------------------------------
# merge overflow / eviction order
# ---------------------------------------------------------------------------
def test_merge_overflow_keeps_newest_entries():
    """Merging a bigger source into a smaller target evicts oldest-first,
    like repeated add calls (reference ReplayBuffer.update semantics)."""
    src = ReplayBuffer(capacity=6, num_envs=1)
    state_src = _fill(src, [[(float(i), False) for i in range(6)]])
    dst = ReplayBuffer(capacity=3, num_envs=1)
    example = jax.tree.map(lambda x: x[0], _tr(0.0))
    state_dst = dst.init(example)
    state_dst = dst.merge(state_dst, src, state_src)
    assert int(state_dst.size[0]) == 3
    chron = dst.chronological(state_dst)
    np.testing.assert_array_equal(
        np.asarray(chron["obs"])[:, 0], [3.0, 4.0, 5.0]
    )


def test_merge_into_partially_filled_target():
    src = ReplayBuffer(capacity=4, num_envs=1)
    state_src = _fill(src, [[(10.0, False), (11.0, True)]])
    dst = ReplayBuffer(capacity=8, num_envs=1)
    state_dst = _fill(dst, [[(0.0, False)]])
    state_dst = dst.merge(state_dst, src, state_src)
    assert int(state_dst.size[0]) == 3
    obs = np.asarray(state_dst.storage["obs"])[0, :3]
    np.testing.assert_array_equal(obs, [0.0, 10.0, 11.0])
    # episode boundary preserved through merge
    assert bool(state_dst.storage["terminated"][0, 2])


def test_merge_is_jittable():
    src = ReplayBuffer(capacity=4, num_envs=1)
    state_src = _fill(src, [[(1.0, False), (2.0, False)]])
    dst = ReplayBuffer(capacity=4, num_envs=1)
    example = jax.tree.map(lambda x: x[0], _tr(0.0))
    state_dst = dst.init(example)
    merged = jax.jit(lambda a, b: dst.merge(a, src, b))(state_dst, state_src)
    assert int(merged.size[0]) == 2


# ---------------------------------------------------------------------------
# memory options combined
# ---------------------------------------------------------------------------
def test_ignore_obs_next_with_frame_stack():
    """obs_next reconstruction composes with frame stacking: the stack ends
    at next(pos) (reference buffer/base.py:390-405)."""
    buf = ReplayBuffer(capacity=8, num_envs=1, stack_num=2, ignore_obs_next=True)
    eps = [[(0.0, False), (1.0, False), (2.0, False), (3.0, True)]]
    state = _fill(buf, eps)
    assert "obs_next" not in state.storage.keys()
    got = buf.get(state, jnp.asarray([0, 0]), jnp.asarray([1, 3]))
    # at pos1: obs stack [0,1]; obs_next stack ends at pos2 -> [1,2]
    np.testing.assert_array_equal(np.asarray(got["obs"]), [[0, 1], [2, 3]])
    np.testing.assert_array_equal(np.asarray(got["obs_next"])[0], [1, 2])
    # at pos3 (terminal) next saturates -> obs_next == obs stack [2,3]
    np.testing.assert_array_equal(np.asarray(got["obs_next"])[1], [2, 3])


def test_save_only_last_obs_plus_ignore_obs_next_memory_shape():
    """Together the two options store exactly ONE unstacked frame per step —
    the 2*(stack+1)x dedup the reference's Atari configs rely on."""
    stack = 4
    buf = ReplayBuffer(
        capacity=10, num_envs=1, stack_num=stack,
        save_only_last_obs=True, ignore_obs_next=True,
    )
    frame = lambda i: np.stack([np.full((2, 2), i - j, np.float32)
                                for j in reversed(range(stack))])
    example = Batch(
        obs=frame(0), act=np.int32(0), rew=np.float32(0),
        terminated=False, truncated=False, obs_next=frame(0) + 0.5,
    )
    state = buf.init(example)
    assert "obs_next" not in state.storage.keys()
    assert state.storage["obs"].shape == (1, 10, 2, 2)  # ONE frame per slot
    for i in range(5):
        tr = Batch(
            obs=frame(i)[None], act=np.asarray([0], np.int32),
            rew=np.asarray([0.0], np.float32),
            terminated=np.asarray([False]), truncated=np.asarray([False]),
            obs_next=(frame(i + 1))[None],
        )
        state = buf.add(state, tr)
    got = buf.get(state, jnp.asarray([0]), jnp.asarray([4]))
    # stored newest frames are full((2,2), i); stack at pos4 = frames 1..4
    np.testing.assert_array_equal(
        np.asarray(got["obs"])[0, :, 0, 0], [1, 2, 3, 4]
    )
    # obs_next at the newest element saturates to the same stack
    np.testing.assert_array_equal(
        np.asarray(got["obs_next"])[0, :, 0, 0], [1, 2, 3, 4]
    )


# ---------------------------------------------------------------------------
# generic nested-object HDF5 persistence (converter.py:80-130 analog)
# ---------------------------------------------------------------------------
def test_generic_pytree_hdf5_with_pickle_fallback(tmp_path):
    from tianshou_tpu.data.persistence import load_pytree_hdf5, save_pytree_hdf5

    class Custom:
        def __init__(self, v):
            self.v = v

        def __eq__(self, other):
            return isinstance(other, Custom) and other.v == self.v

    tree = {
        "arrays": Batch(x=np.arange(6).reshape(2, 3), y=np.ones(2)),
        "meta": {
            "name": "run-7",            # unicode -> pickle fallback
            "obj": Custom([1, 2, 3]),   # arbitrary object
            "ragged": [[1, 2], [3]],    # ragged -> pickle fallback
            "scalar": np.float32(2.5),
        },
    }
    p = os.path.join(tmp_path, "tree.h5")
    save_pytree_hdf5(p, tree)
    back = load_pytree_hdf5(p)
    assert isinstance(back["arrays"], Batch)
    np.testing.assert_array_equal(back["arrays"].x, tree["arrays"].x)
    assert back["meta"]["name"] == "run-7"
    assert back["meta"]["obj"] == Custom([1, 2, 3])
    assert back["meta"]["ragged"] == [[1, 2], [3]]
    assert back["meta"]["scalar"] == np.float32(2.5)
