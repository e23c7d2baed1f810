"""Example scripts as product surface: each new round-3 script runs end to
end in a tiny configuration (the reference's examples are its CLI; a
broken script is a broken product path even when the library tests pass)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout):
    return subprocess.run(
        [sys.executable, *args],
        cwd=REPO, capture_output=True, text=True, timeout=timeout,
        env=dict(os.environ),
    )


def test_atari_dqn_example_fake_ale():
    """examples/atari_dqn.py --fake-ale: the full preprocessing chain +
    frame-dedup buffer + NatureCNN trains a tiny budget and reports."""
    r = _run(
        ["examples/atari_dqn.py", "--fake-ale", "--platform", "cpu",
         "--max-epoch", "1", "--step-per-epoch", "600",
         "--warmup-steps", "200", "--training-num", "4", "--test-num", "2",
         "--logdir", "/tmp/test_atari_smoke"],
        timeout=420,
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert "DQN/ALE/Pong-v5" in r.stdout


def test_cpp_pool_example_bench_mode():
    """examples/cpp_pool_dqn.py --bench prints all three throughput rows
    (pool CartPole, gymnasium host venv, pool Reacher2)."""
    r = _run(
        ["examples/cpp_pool_dqn.py", "--bench", "--num-envs", "4",
         "--bench-steps", "200", "--platform", "cpu"],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    for row in ("cpp_pool CartPole-v1", "host_venv CartPole-v1",
                "cpp_pool Reacher2"):
        assert row in r.stdout, r.stdout[-1000:]


def test_box2d_dqn_example():
    """examples/box2d_dqn.py: LunarLander-v3 dueling DQN through the host
    bridge runs end to end at a tiny budget."""
    r = _run(
        ["examples/box2d_dqn.py", "--platform", "cpu",
         "--max-epoch", "1", "--step-per-epoch", "1500",
         "--num-envs", "4", "--test-envs", "2", "--stop-reward", "1e9",
         "--logdir", "/tmp/test_lunar_smoke"],
        timeout=420,
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert "DQN/LunarLander-v3" in r.stdout


def test_a2c_mujoco_example():
    """examples/mujoco_a2c.py at a tiny budget (reference on-policy A2C
    config through the obs-normalized host bridge)."""
    r = _run(
        ["examples/mujoco_a2c.py", "--platform", "cpu",
         "--max-epoch", "1", "--step-per-epoch", "800",
         "--num-envs", "4", "--test-envs", "2",
         "--logdir", "/tmp/test_a2c_smoke"],
        timeout=420,
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert "A2C/HalfCheetah-v4" in r.stdout


def test_atari_collector_stores_exact_warped_frames():
    """Exact-content check through the product path: the frame stored in
    the replay buffer at step t IS the wrap_deepmind output frame for
    step t (deterministic FakeAtariEnv, single env, no exploration
    ambiguity — the reference's test_collector exact-buffer-content
    pattern applied to the Atari chain)."""
    import jax

    from tianshou_tpu.algos.base import RandomPolicy
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.atari import FakeAtariEnv, wrap_deepmind
    from tianshou_tpu.envs.host import HostVectorEnv, space_from_gym

    mk = lambda: wrap_deepmind(FakeAtariEnv(seed=5), frame_stack=4)
    venv = HostVectorEnv([mk])

    algo = RandomPolicy(space_from_gym(venv.action_space))
    buffer = ReplayBuffer(
        capacity=32, num_envs=1, stack_num=4,
        save_only_last_obs=True, ignore_obs_next=True,
    )
    col = HostCollector(algo, venv, buffer)
    col.reset(seed=0)
    ts = algo.init(jax.random.key(0), None)
    _, _, traj = col.collect(
        ts, None, 1, jax.random.key(1), record_traj=True
    )
    example = jax.tree.map(lambda x: np.asarray(x)[0, 0], traj)
    bstate = buffer.init(example)
    bstate, _, traj = col.collect(
        ts, bstate, 10, jax.random.key(1), record_traj=True
    )
    stored = np.asarray(bstate.storage["obs"][0])  # [capacity, 84, 84]
    traj_obs = np.asarray(traj["obs"])  # [10, 1, 4, 84, 84] full stacks
    assert int(np.asarray(bstate.size)[0]) == 10
    # dedup contract: slot t holds EXACTLY the newest frame of the stacked
    # observation the policy acted on at step t — nothing else
    for t in range(10):
        np.testing.assert_array_equal(stored[t], traj_obs[t, 0, -1])
    # and the gathered stack at slot 9 reproduces the original stack
    # (prev-chain reconstruction; frames 6..9 were all within the segment)
    got = buffer.get(
        bstate, np.zeros(1, np.int32), np.asarray([9]), keys=("obs",)
    )
    np.testing.assert_array_equal(np.asarray(got["obs"])[0], traj_obs[9, 0])
