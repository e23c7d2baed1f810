"""D4RL-format offline ingestion (reference ``examples/offline/utils.py``):
schema mapping, file round-trips (h5 + npz), obs normalization, and the
offline CQL example consuming a dataset file end to end."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tianshou_tpu.data.persistence import (
    buffer_from_d4rl,
    normalize_obs_in_buffer,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _toy_dataset(n=64, obs_dim=3, act_dim=1):
    rng = np.random.default_rng(0)
    terminals = np.zeros(n, bool)
    terminals[20] = True  # an episode boundary
    timeouts = np.zeros(n, bool)
    timeouts[45] = True
    return {
        "observations": rng.normal(size=(n, obs_dim)).astype(np.float32),
        "actions": rng.normal(size=(n, act_dim)).astype(np.float32),
        "rewards": rng.normal(size=n).astype(np.float64),  # d4rl uses f64
        "terminals": terminals,
        "timeouts": timeouts,
        "next_observations": rng.normal(size=(n, obs_dim)).astype(np.float32),
    }


def test_schema_mapping_and_termination_split():
    data = _toy_dataset()
    buffer, state = buffer_from_d4rl(data)
    assert int(state.size[0]) == 64 and buffer.capacity == 64
    np.testing.assert_array_equal(
        np.asarray(state.storage["terminated"][0]), data["terminals"]
    )
    np.testing.assert_array_equal(
        np.asarray(state.storage["truncated"][0]), data["timeouts"]
    )
    assert np.asarray(state.storage["rew"]).dtype == np.float32
    # n-step chains must stop at the terminal boundary
    import jax

    rew_chain, done_chain, term_pos = buffer.nstep_chain(
        state, jax.numpy.zeros(1, jax.numpy.int32),
        jax.numpy.asarray([19]), 3,
    )
    assert int(done_chain[0].sum()) >= 1  # crossed the episode end


@pytest.mark.parametrize("ext", ["h5", "npz"])
def test_file_roundtrip(tmp_path, ext):
    import h5py

    data = _toy_dataset()
    path = str(tmp_path / f"d.{ext}")
    if ext == "h5":
        with h5py.File(path, "w") as f:
            for k, v in data.items():
                f.create_dataset(k, data=v)
    else:
        np.savez(path, **data)
    buffer, state = buffer_from_d4rl(path)
    np.testing.assert_allclose(
        np.asarray(state.storage["obs"][0]), data["observations"], rtol=1e-6
    )


def test_missing_keys_rejected():
    data = _toy_dataset()
    del data["next_observations"]
    with pytest.raises(AssertionError, match="missing"):
        buffer_from_d4rl(data)


def test_normalize_obs():
    data = _toy_dataset(n=256)
    _, state = buffer_from_d4rl(data)
    state2, mean, std = normalize_obs_in_buffer(state)
    obs = np.asarray(state2.storage["obs"][0])
    np.testing.assert_allclose(obs.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(obs.std(0), 1.0, atol=1e-2)
    # obs_next transformed with the SAME stats
    expected = (data["next_observations"] - mean) / std
    np.testing.assert_allclose(
        np.asarray(state2.storage["obs_next"][0]), expected, rtol=1e-5
    )


def test_offline_example_consumes_dataset_file(tmp_path):
    """Full product path: generate a demo dataset file, then run the CQL
    offline example on it (tiny budget, CPU)."""
    path = str(tmp_path / "pendulum_demo.h5")
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-m", "tests.make_d4rl_demo", path,
         "--steps", "2000", "--platform", "cpu"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(path)
    r = subprocess.run(
        [
            sys.executable, "examples/offline_d4rl_cql.py", path,
            "--platform", "cpu", "--task", "Pendulum-v1",
            "--max-epoch", "1", "--update-per-epoch", "10",
            "--batch-size", "32", "--hidden", "16",
            "--normalize-obs", "--test-envs", "2",
            "--logdir", str(tmp_path / "log"),
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert "CQL/Pendulum-v1" in r.stdout, r.stdout[-1500:]


def test_load_reference_layout_hdf5(tmp_path):
    """Cross-ecosystem migration: read a buffer file in the REFERENCE
    library's ``save_hdf5`` layout (object ``__dict__`` -> root attrs +
    ``_meta`` Batch group, ``buffer/base.py:110-113`` /
    ``utils/converter.py:93+``; layout reproduced here byte-for-byte since
    the reference package itself is not importable in this image)."""
    import h5py
    import jax

    from tianshou_tpu.data.persistence import load_reference_buffer_hdf5

    rng = np.random.default_rng(1)
    maxsize, size, index = 10, 7, 3  # partially filled ring, wrapped cursor
    obs = rng.normal(size=(maxsize, 4)).astype(np.float32)
    path = str(tmp_path / "ref.h5")
    with h5py.File(path, "w") as f:
        f.attrs["maxsize"] = maxsize
        f.attrs["_index"] = index
        f.attrs["_size"] = size
        f.attrs["stack_num"] = 1
        meta = f.create_group("_meta")
        meta.attrs["__data_type__"] = "Batch"
        for k, v in {
            "obs": obs,
            "act": rng.integers(0, 2, maxsize).astype(np.int64),
            "rew": rng.normal(size=maxsize).astype(np.float64),
            "terminated": np.zeros(maxsize, bool),
            "truncated": np.zeros(maxsize, bool),
            "done": np.zeros(maxsize, bool),
            "obs_next": rng.normal(size=(maxsize, 4)).astype(np.float32),
        }.items():
            d = meta.create_dataset(k, data=v)
            d.attrs["__data_type__"] = "ndarray"

    buffer, state = load_reference_buffer_hdf5(path)
    assert buffer.capacity == maxsize
    assert int(state.size[0]) == size and int(state.cursor[0]) == index
    np.testing.assert_allclose(np.asarray(state.storage["obs"][0]), obs)
    assert np.asarray(state.storage["rew"]).dtype == np.float32
    # the loaded state samples through the normal pipeline
    batch, env_idx, pos = buffer.sample(state, jax.random.key(0), 32)
    assert np.asarray(batch["obs"]).shape == (32, 4)
    # only filled slots are sampled: positions within the valid window
    assert np.asarray(pos).max() < maxsize


def test_load_reference_layout_old_done_only(tmp_path):
    """Old reference files with only ``done``: done maps to terminated."""
    import h5py

    from tianshou_tpu.data.persistence import load_reference_buffer_hdf5

    path = str(tmp_path / "old.h5")
    done = np.asarray([0, 1, 0, 0], bool)
    with h5py.File(path, "w") as f:
        f.attrs["maxsize"] = 4
        f.attrs["_index"] = 0
        f.attrs["_size"] = 4
        meta = f.create_group("_meta")
        meta.create_dataset("obs", data=np.zeros((4, 2), np.float32))
        meta.create_dataset("act", data=np.zeros(4, np.int64))
        meta.create_dataset("rew", data=np.ones(4, np.float64))
        meta.create_dataset("done", data=done)
        meta.create_dataset("obs_next", data=np.zeros((4, 2), np.float32))
    _, state = load_reference_buffer_hdf5(path)
    np.testing.assert_array_equal(np.asarray(state.storage["terminated"][0]), done)
    assert not np.asarray(state.storage["truncated"]).any()


def test_load_reference_layout_atari_memory_flags(tmp_path):
    """Reference Atari buffers (ignore_obs_next=True, save_only_last_obs,
    stack_num=4: NO obs_next dataset, one frame per slot) must load with
    the same flags so n-step sampling reconstructs stacks instead of
    KeyError-ing (round-3 review finding)."""
    import h5py
    import jax

    from tianshou_tpu.data.persistence import load_reference_buffer_hdf5

    maxsize = 16
    frames = np.arange(maxsize * 4 * 4, dtype=np.uint8).reshape(maxsize, 4, 4)
    path = str(tmp_path / "atari_ref.h5")
    with h5py.File(path, "w") as f:
        f.attrs["maxsize"] = maxsize
        f.attrs["_index"] = 0
        f.attrs["_size"] = maxsize
        opts = f.create_group("options")
        opts.attrs["stack_num"] = 4
        opts.attrs["ignore_obs_next"] = True
        opts.attrs["save_only_last_obs"] = True
        meta = f.create_group("_meta")
        meta.create_dataset("obs", data=frames)  # single frame per slot
        meta.create_dataset("act", data=np.zeros(maxsize, np.int64))
        meta.create_dataset("rew", data=np.ones(maxsize, np.float64))
        meta.create_dataset("terminated", data=np.zeros(maxsize, bool))
        meta.create_dataset("truncated", data=np.zeros(maxsize, bool))
        # NO obs_next dataset — the reference stores none in this mode

    buffer, state = load_reference_buffer_hdf5(path)
    assert buffer.ignore_obs_next and buffer.save_only_last_obs
    assert buffer.stack_num == 4
    # the full n-step sampling pipeline works on the imported state
    batch = buffer.get(
        state, np.zeros(8, np.int32), np.arange(4, 12), keys=("obs", "obs_next")
    )
    assert np.asarray(batch["obs"]).shape == (8, 4, 4, 4)  # stack rebuilt
    assert np.asarray(batch["obs_next"]).shape == (8, 4, 4, 4)


def test_load_any_buffer_dispatch(tmp_path):
    """load_any_buffer routes each of the three supported layouts."""
    import h5py
    import jax

    from tianshou_tpu.algos.base import RandomPolicy
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.data.persistence import load_any_buffer, save_buffer_hdf5
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import Pendulum

    # (a) our own layout
    env = Pendulum()
    algo = RandomPolicy(env.action_space)
    buf = ReplayBuffer(capacity=20, num_envs=2)
    col = Collector(algo, VectorEnv(env, 2), buf)
    cstate = col.reset(jax.random.key(0))
    ts = algo.init(jax.random.key(1), None)
    bstate = buf.init(col.example_transition(ts, cstate))
    _, bstate, _, _ = col.collect(ts, cstate, bstate, 5)
    own = str(tmp_path / "own.h5")
    save_buffer_hdf5(own, bstate)
    b, st = load_any_buffer(own)
    assert b.num_envs == 2 and int(np.asarray(st.size).sum()) == 10

    # (b) D4RL layout
    d4 = str(tmp_path / "d4.h5")
    with h5py.File(d4, "w") as f:
        for k, v in _toy_dataset(64).items():
            f.create_dataset(k, data=v)
    b, st = load_any_buffer(d4)
    assert b.capacity == 64

    # (c) reference layout
    ref = str(tmp_path / "ref.h5")
    with h5py.File(ref, "w") as f:
        f.attrs["maxsize"] = 4
        f.attrs["_index"] = 0
        f.attrs["_size"] = 4
        meta = f.create_group("_meta")
        meta.create_dataset("obs", data=np.zeros((4, 2), np.float32))
        meta.create_dataset("act", data=np.zeros(4, np.int64))
        meta.create_dataset("rew", data=np.ones(4, np.float64))
        meta.create_dataset("done", data=np.zeros(4, bool))
        meta.create_dataset("obs_next", data=np.zeros((4, 2), np.float32))
    b, st = load_any_buffer(ref)
    assert b.capacity == 4

    # (d) junk layout is rejected with a clear error
    junk = str(tmp_path / "junk.h5")
    with h5py.File(junk, "w") as f:
        f.create_dataset("whatever", data=np.zeros(3))
    with pytest.raises(ValueError, match="unrecognized buffer layout"):
        load_any_buffer(junk)


def test_demo_dataset_episode_contiguity(tmp_path):
    """make_d4rl_demo must emit env-contiguous episodes: within each env's
    block, terminals/timeouts delimit episodes and every block ends closed
    (round-3 review finding: a [T,N] reshape interleaves envs)."""
    from tests.make_d4rl_demo import generate

    data = generate(steps=400, seed=0)
    obs = data["observations"]
    done = data["terminals"] | data["timeouts"]
    n = len(obs)
    # Pendulum truncates at 200: done rows must be spaced <= 200 apart
    done_idx = np.flatnonzero(done)
    assert done_idx.size >= n // 200 - 1
    gaps = np.diff(np.concatenate([[-1], done_idx]))
    assert gaps.max() <= 200, gaps.max()
    # the dataset tail is closed (last row of the last env block is done)
    assert done[-1]
