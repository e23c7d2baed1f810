"""Ring buffer semantics tests (mirrors the applicable parts of the
reference's ``test/base/test_buffer.py``: circular writes, episode-aware
prev/next, uniform sampling, n-step chains, frame stacking)."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer


def _example():
    return Batch(
        obs=np.zeros(2, np.float32),
        act=np.zeros((), np.int32),
        rew=np.zeros((), np.float32),
        terminated=np.zeros((), bool),
        truncated=np.zeros((), bool),
        obs_next=np.zeros(2, np.float32),
    )


def _tr(i, num_envs=1, terminated=False, truncated=False):
    """Transition batch for all envs with obs filled with i."""
    return Batch(
        obs=np.full((num_envs, 2), i, np.float32),
        act=np.full((num_envs,), i, np.int32),
        rew=np.full((num_envs,), float(i), np.float32),
        terminated=np.full((num_envs,), terminated),
        truncated=np.full((num_envs,), truncated),
        obs_next=np.full((num_envs, 2), i + 1, np.float32),
    )


def test_ring_write_and_overwrite():
    buf = ReplayBuffer(capacity=4, num_envs=1)
    st = buf.init(_example())
    for i in range(6):
        st = buf.add(st, _tr(i).to_jax())
    assert int(st.size[0]) == 4
    assert int(st.cursor[0]) == 2  # 6 % 4
    # slots hold the last 4 transitions: 2,3,4,5 at ring positions 2,3,0,1
    acts = np.asarray(st.storage["act"][0])
    assert list(acts) == [4, 5, 2, 3]


def test_prev_next_episode_aware():
    buf = ReplayBuffer(capacity=8, num_envs=1)
    st = buf.init(_example())
    # episode 1: steps 0,1,2 (2 terminated); episode 2: steps 3,4
    for i, term in [(0, False), (1, False), (2, True), (3, False), (4, False)]:
        st = buf.add(st, _tr(i, terminated=term).to_jax())
    env = jnp.zeros(5, jnp.int32)
    pos = jnp.arange(5)
    nxt = np.asarray(buf.next_pos(st, env, pos))
    # next saturates at the episode end (pos 2) and at the newest (pos 4)
    assert list(nxt) == [1, 2, 2, 4, 4]
    prv = np.asarray(buf.prev_pos(st, env, pos))
    # prev saturates at episode starts (pos 0 and pos 3)
    assert list(prv) == [0, 0, 1, 3, 3]


def test_uniform_sampling_covers_valid_range():
    buf = ReplayBuffer(capacity=10, num_envs=2)
    st = buf.init(_example())
    for i in range(5):
        st = buf.add(st, _tr(i, num_envs=2).to_jax())
    env_idx, pos = buf.sample_indices(st, jax.random.key(0), 256)
    env_idx, pos = np.asarray(env_idx), np.asarray(pos)
    assert set(np.unique(env_idx)) <= {0, 1}
    assert pos.max() < 5  # only 5 valid entries per env
    batch = buf.get(st, jnp.asarray(env_idx), jnp.asarray(pos))
    # obs leaf values must be one of the written values 0..4
    assert set(np.unique(np.asarray(batch["act"]))) <= set(range(5))
    assert "done" in batch


def test_nstep_chain_saturates_at_done():
    buf = ReplayBuffer(capacity=8, num_envs=1)
    st = buf.init(_example())
    for i, term in [(0, False), (1, False), (2, True), (3, False), (4, False)]:
        st = buf.add(st, _tr(i, terminated=term).to_jax())
    env = jnp.zeros(1, jnp.int32)
    rew, done, term_pos = buf.nstep_chain(st, env, jnp.asarray([0]), n_step=4)
    # chain from 0: rewards 0,1,2 then saturate at 2 (done)
    np.testing.assert_allclose(np.asarray(rew)[0], [0, 1, 2, 2])
    np.testing.assert_allclose(np.asarray(done)[0], [0, 0, 1, 1])
    assert int(term_pos[0]) == 2
    # chain from 3: 3,4 then saturate at newest
    rew, done, term_pos = buf.nstep_chain(st, env, jnp.asarray([3]), n_step=4)
    np.testing.assert_allclose(np.asarray(rew)[0], [3, 4, 4, 4])
    assert int(term_pos[0]) == 4


def test_frame_stack_saturates_at_episode_start():
    buf = ReplayBuffer(capacity=8, num_envs=1, stack_num=3)
    st = buf.init(_example())
    for i, term in [(0, False), (1, False), (2, True), (3, False), (4, False)]:
        st = buf.add(st, _tr(i, terminated=term).to_jax())
    env = jnp.zeros(3, jnp.int32)
    pos = jnp.asarray([0, 2, 4])
    stacked = np.asarray(buf.stacked_obs(st, env, pos))
    # pos 0 is an episode start: frames [0,0,0]
    np.testing.assert_allclose(stacked[0, :, 0], [0, 0, 0])
    # pos 2: frames [0,1,2]
    np.testing.assert_allclose(stacked[1, :, 0], [0, 1, 2])
    # pos 4 (second episode, start at 3): frames [3,3,4]
    np.testing.assert_allclose(stacked[2, :, 0], [3, 3, 4])


def test_add_trajectory_and_chronological():
    buf = ReplayBuffer(capacity=4, num_envs=2)
    st = buf.init(_example())
    T = 4
    traj = Batch(
        obs=np.arange(T * 2 * 2, dtype=np.float32).reshape(T, 2, 2),
        act=np.arange(T * 2, dtype=np.int32).reshape(T, 2),
        rew=np.zeros((T, 2), np.float32),
        terminated=np.zeros((T, 2), bool),
        truncated=np.zeros((T, 2), bool),
        obs_next=np.zeros((T, 2, 2), np.float32),
    ).to_jax()
    st = buf.add_trajectory(st, traj)
    assert int(st.size[0]) == 4
    chron = buf.chronological(st)
    np.testing.assert_allclose(
        np.asarray(chron["act"]), np.asarray(traj["act"])
    )


def test_buffer_ops_inside_jit():
    buf = ReplayBuffer(capacity=16, num_envs=2)
    st = buf.init(_example())

    @jax.jit
    def fill_and_sample(st, key):
        def body(st, i):
            tr = Batch(
                obs=jnp.full((2, 2), i, jnp.float32),
                act=jnp.full((2,), i, jnp.int32),
                rew=jnp.full((2,), 1.0),
                terminated=jnp.zeros((2,), bool),
                truncated=jnp.zeros((2,), bool),
                obs_next=jnp.full((2, 2), i + 1, jnp.float32),
            )
            return buf.add(st, tr), None

        st, _ = jax.lax.scan(body, st, jnp.arange(10))
        batch, env_idx, pos = buf.sample(st, key, 32)
        return st, batch

    st, batch = fill_and_sample(st, jax.random.key(1))
    assert int(st.size[0]) == 10
    assert np.asarray(batch["obs"]).shape == (32, 2)


def test_her_rewrite_semantics():
    """HER 'future' rewrite: rewritten goals come from within the same
    episode, and rewards are recomputed consistently."""
    import jax
    import jax.numpy as jnp
    from tests.helpers import GoalReachEnv
    from tianshou_tpu.data.her import HERReplayBuffer

    buf = HERReplayBuffer(
        capacity=64,
        num_envs=1,
        compute_reward_fn=GoalReachEnv.compute_reward,
        achieved_slice=(1, 2),
        desired_slice=(2, 3),
        horizon=8,
        future_k=1e9,  # always rewrite
    )
    # hand-build two episodes: positions 0..4 (ep 1, terminated), 0..2 (ep 2)
    ex = Batch(
        obs=np.zeros(3, np.float32), act=np.zeros(1, np.float32),
        rew=np.zeros((), np.float32), terminated=np.zeros((), bool),
        truncated=np.zeros((), bool), obs_next=np.zeros(3, np.float32),
    )
    st = buf.init(ex)
    goal = 99.0  # unreachable original goal
    for ep_len in (5, 3):
        for i in range(ep_len):
            tr = Batch(
                obs=np.asarray([[i, i, goal]], np.float32),
                act=np.ones((1, 1), np.float32),
                rew=np.full((1,), -1.0, np.float32),
                terminated=np.asarray([i == ep_len - 1]),
                truncated=np.zeros(1, bool),
                obs_next=np.asarray([[i + 1, i + 1, goal]], np.float32),
            )
            st = buf.add(st, tr.to_jax())

    env_idx, pos, w, batch = buf.sample_her(st, jax.random.key(0), 256)
    obs = np.asarray(batch["obs"])
    obs_next = np.asarray(batch["obs_next"])
    rew = np.asarray(batch["rew"])
    pos_np = np.asarray(pos)
    # rewritten desired goals must be achieved goals from the SAME episode
    # (future): for episode-1 samples (pos 0..4) goals in 1..5; for
    # episode-2 samples (pos 5..7) goals in 6..8
    ep1 = pos_np < 5
    assert np.all(obs[ep1, 2] <= 5) and np.all(obs[ep1, 2] >= 1)
    # episode 2 replays positions 0..2, so its achieved goals are 1..3
    assert np.all(obs[~ep1, 2] >= 1) and np.all(obs[~ep1, 2] <= 3)
    # future goal is >= this transition's next achieved position
    assert np.all(obs[:, 2] >= obs_next[:, 1] - 1e-6)
    # reward recomputation: 0 exactly when achieved(next) == desired
    np.testing.assert_array_equal(
        rew == 0.0, np.abs(obs_next[:, 1] - obs[:, 2]) <= 0.5
    )
    # obs and obs_next carry the same rewritten goal
    np.testing.assert_allclose(obs[:, 2], obs_next[:, 2])


def _stacked_tr(i, k, terminated=False):
    """Transition whose obs is the frame stack ending at step i (frame j =
    [j], saturated at 0) — what a FrameStack env emits."""
    frames = np.asarray([[max(0, j)] for j in range(i - k + 1, i + 1)], np.float32)
    frames_next = np.asarray(
        [[max(0, j)] for j in range(i - k + 2, i + 2)], np.float32
    )
    return Batch(
        obs=frames[None],
        act=np.full((1,), i, np.int32),
        rew=np.full((1,), float(i), np.float32),
        terminated=np.asarray([terminated]),
        truncated=np.zeros(1, bool),
        obs_next=frames_next[None],
    )


def test_save_only_last_obs_dedup_and_stacked_get():
    """``save_only_last_obs`` stores one frame per slot (k-fold dedup) and
    ``get`` reconstructs in-episode stacks, saturating at episode starts
    (reference ``buffer/base.py:267-272,340-382``)."""
    k = 3
    buf = ReplayBuffer(
        capacity=8, num_envs=1, stack_num=k,
        save_only_last_obs=True, ignore_obs_next=True,
    )
    ex = Batch(
        obs=np.zeros((k, 1), np.float32), act=np.zeros((), np.int32),
        rew=np.zeros((), np.float32), terminated=np.zeros((), bool),
        truncated=np.zeros((), bool), obs_next=np.zeros((k, 1), np.float32),
    )
    st = buf.init(ex)
    # storage is deduplicated: one frame per slot, no obs_next at all
    assert st.storage["obs"].shape == (1, 8, 1)
    assert "obs_next" not in st.storage
    # episode 1: steps 0..4 (4 terminates); frames stored: 0,1,2,3,4
    for i in range(5):
        st = buf.add(st, _stacked_tr(i, k, terminated=(i == 4)).to_jax())
    env = jnp.zeros(5, jnp.int32)
    pos = jnp.arange(5)
    got = buf.get(st, env, pos, keys=("obs", "obs_next"))
    obs = np.asarray(got["obs"])[:, :, 0]  # [5, k]
    # stacks saturate at the episode start: pos 0 -> [0,0,0]; pos 2 -> [0,1,2]
    np.testing.assert_array_equal(obs[0], [0, 0, 0])
    np.testing.assert_array_equal(obs[1], [0, 0, 1])
    np.testing.assert_array_equal(obs[2], [0, 1, 2])
    np.testing.assert_array_equal(obs[4], [2, 3, 4])
    # obs_next reconstructed as the stack ending at next(pos); saturates at
    # the terminal slot (reference base.py:401-405)
    obs_next = np.asarray(got["obs_next"])[:, :, 0]
    np.testing.assert_array_equal(obs_next[0], [0, 0, 1])
    np.testing.assert_array_equal(obs_next[3], [2, 3, 4])
    np.testing.assert_array_equal(obs_next[4], [2, 3, 4])  # terminal: saturate


def test_sample_avail_masks_short_stacks():
    """``sample_avail``: only indices whose full stack lies within one
    episode are sampled (reference ``buffer/base.py:306-328``)."""
    k = 3
    buf = ReplayBuffer(
        capacity=16, num_envs=1, stack_num=k,
        save_only_last_obs=True, ignore_obs_next=True, sample_avail=True,
    )
    ex = Batch(
        obs=np.zeros((k, 1), np.float32), act=np.zeros((), np.int32),
        rew=np.zeros((), np.float32), terminated=np.zeros((), bool),
        truncated=np.zeros((), bool), obs_next=np.zeros((k, 1), np.float32),
    )
    st = buf.init(ex)
    # episode 1: length 5 (positions 0-4); episode 2: length 2 (5-6, too
    # short for a full 3-stack); episode 3: length 4 (7-10)
    step = 0
    for ep_len in (5, 2, 4):
        for j in range(ep_len):
            st = buf.add(
                st, _stacked_tr(step, k, terminated=(j == ep_len - 1)).to_jax()
            )
            step += 1
    env_idx, pos = buf.sample_indices(st, jax.random.key(0), 512)
    pos_np = np.asarray(pos)
    # valid: positions 2,3,4 (ep 1 with >=2 predecessors) and 9,10 (ep 3)
    valid = {2, 3, 4, 9, 10}
    assert set(pos_np.tolist()) <= valid, sorted(set(pos_np.tolist()))
    # all valid slots actually get sampled
    assert set(pos_np.tolist()) == valid


def test_framestack_dqn_dedup_trains():
    """End-to-end: frame-stacked CartPole DQN training from a deduplicated
    (save_only_last_obs + ignore_obs_next) buffer reaches the reward bar —
    the memory layout that makes a 1M-transition pixel buffer fit in HBM."""
    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.envs.wrappers import FrameStack
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    env = FrameStack(CartPole(), 4)
    algo = DQN(
        network=QNet((64, 64), 2),
        action_space=env.action_space,
        gamma=0.9,
        n_step=1,
        target_update_freq=100,
    )
    buffer = ReplayBuffer(
        capacity=1000, num_envs=8, stack_num=4,
        save_only_last_obs=True, ignore_obs_next=True, sample_avail=True,
    )
    trainer = OffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 8), buffer),
        Collector(algo, VectorEnv(env, 8)),
        buffer,
        max_epoch=3,
        step_per_epoch=5000,
        step_per_collect=80,
        update_per_step=0.125,
        batch_size=64,
        train_param_fn=lambda e, s: 0.1,
        stop_fn=lambda rew: rew >= 150,
        warmup_steps=500,
        seed=2,
    )
    info = trainer.run()
    assert info.best_reward >= 150, f"best={info.best_reward}"


def test_her_keeps_stored_reward_for_unrewritten_rows():
    """Non-relabeled samples must keep the buffer's stored (possibly
    shaped) reward — the reference recomputes rewards only for relabeled
    episodes (``her.py:146-160``).  Regression test for the round-2 bug
    where ``compute_reward_fn`` overwrote ALL rows."""
    import jax
    from tests.helpers import GoalReachEnv
    from tianshou_tpu.data.her import HERReplayBuffer

    buf = HERReplayBuffer(
        capacity=16,
        num_envs=1,
        compute_reward_fn=GoalReachEnv.compute_reward,
        achieved_slice=(1, 2),
        desired_slice=(2, 3),
        horizon=8,
        future_k=2.0,  # rewrite ~half the samples
    )
    ex = Batch(
        obs=np.zeros(3, np.float32), act=np.zeros(1, np.float32),
        rew=np.zeros((), np.float32), terminated=np.zeros((), bool),
        truncated=np.zeros((), bool), obs_next=np.zeros(3, np.float32),
    )
    st = buf.init(ex)
    shaped = 7.5  # sentinel distinct from anything compute_reward returns
    for i in range(6):
        tr = Batch(
            obs=np.asarray([[i, i, 99.0]], np.float32),
            act=np.ones((1, 1), np.float32),
            rew=np.full((1,), shaped, np.float32),
            terminated=np.asarray([i == 5]),
            truncated=np.zeros(1, bool),
            obs_next=np.asarray([[i + 1, i + 1, 99.0]], np.float32),
        )
        st = buf.add(st, tr.to_jax())

    _, _, _, batch = buf.sample_her(st, jax.random.key(3), 2048)
    goals = np.asarray(batch["obs"])[:, 2]
    rew = np.asarray(batch["rew"])
    unrewritten = goals == 99.0
    # both populations must be present at future_k=2
    assert unrewritten.sum() > 400 and (~unrewritten).sum() > 400
    # unrewritten rows keep the stored shaped reward verbatim
    np.testing.assert_array_equal(rew[unrewritten], shaped)
    # rewritten rows get the recomputed sparse reward (0 or -1), never 7.5
    assert np.all(np.isin(rew[~unrewritten], (-1.0, 0.0)))


def test_her_future_offset_uniform_over_remainder():
    """The 'future' offset follows the reference's ``round(uniform *
    remainder)`` distribution (``her.py:126-130``): for an episode much
    shorter than the horizon, the terminal transition must NOT be
    overweighted (a fixed-window offset would pick it ~80% of the time)."""
    import jax
    from tests.helpers import GoalReachEnv
    from tianshou_tpu.data.her import HERReplayBuffer

    buf = HERReplayBuffer(
        capacity=16,
        num_envs=1,
        compute_reward_fn=GoalReachEnv.compute_reward,
        achieved_slice=(1, 2),
        desired_slice=(2, 3),
        horizon=16,
        future_k=1e9,  # always rewrite
    )
    ex = Batch(
        obs=np.zeros(3, np.float32), act=np.zeros(1, np.float32),
        rew=np.zeros((), np.float32), terminated=np.zeros((), bool),
        truncated=np.zeros((), bool), obs_next=np.zeros(3, np.float32),
    )
    st = buf.init(ex)
    ep_len = 4
    for i in range(ep_len):
        tr = Batch(
            obs=np.asarray([[i, i, 99.0]], np.float32),
            act=np.ones((1, 1), np.float32),
            rew=np.full((1,), -1.0, np.float32),
            terminated=np.asarray([i == ep_len - 1]),
            truncated=np.zeros(1, bool),
            obs_next=np.asarray([[i + 1, i + 1, 99.0]], np.float32),
        )
        st = buf.add(st, tr.to_jax())

    env_idx, pos, w, batch = buf.sample_her(st, jax.random.key(1), 4096)
    pos_np = np.asarray(pos)
    goals = np.asarray(batch["obs"])[:, 2]
    # samples at pos 0: remainder 3, offset = round(u*3) ->
    # P(goal==4 i.e. terminal) = 1/6, not ~13/16 as a fixed window gives
    at0 = pos_np == 0
    assert at0.sum() > 300
    frac_terminal = float(np.mean(goals[at0] == 4.0))
    assert 0.08 < frac_terminal < 0.30, frac_terminal
    # interior offsets carry double mass (round): P(goal==2) ~ 1/3
    frac_mid = float(np.mean(goals[at0] == 2.0))
    assert 0.25 < frac_mid < 0.42, frac_mid


def test_merge_copies_valid_entries_oldest_first():
    dst = ReplayBuffer(capacity=8, num_envs=1)
    dst_st = dst.init(_example())
    for i in range(2):
        dst_st = dst.add(dst_st, _tr(i).to_jax())
    src = ReplayBuffer(capacity=4, num_envs=1)
    src_st = src.init(_example())
    for i in range(6):  # wraps: holds 2,3,4,5
        src_st = src.add(src_st, _tr(10 + i).to_jax())
    merged = dst.merge(dst_st, src, src_st)
    assert int(merged.size[0]) == 6
    # chronological contents: 0,1 then src's oldest-first 12,13,14,15
    acts = np.asarray(merged.storage["act"][0])[:6]
    assert list(acts) == [0, 1, 12, 13, 14, 15]


def test_merge_partial_source_and_overflow():
    dst = ReplayBuffer(capacity=4, num_envs=2)
    dst_st = dst.init(_example())
    for i in range(3):
        dst_st = dst.add(dst_st, _tr(i, num_envs=2).to_jax())
    src = ReplayBuffer(capacity=4, num_envs=2)
    src_st = src.init(_example())
    for i in range(2):  # only 2 valid entries, capacity 4
        src_st = src.add(src_st, _tr(20 + i, num_envs=2).to_jax())
    merged = dst.merge(dst_st, src, src_st)
    # 3 + 2 = 5 > capacity 4: size saturates, oldest (act 0) evicted
    assert list(np.asarray(merged.size)) == [4, 4]
    acts = sorted(np.asarray(merged.storage["act"][0]).tolist())
    assert acts == [1, 2, 20, 21]


def test_from_data_builds_full_buffer():
    n = 7
    data = Batch(
        obs=np.arange(n * 2, dtype=np.float32).reshape(n, 2),
        act=np.arange(n, dtype=np.int32),
        rew=np.ones(n, np.float32),
        terminated=np.zeros(n, bool),
        truncated=np.zeros(n, bool),
        obs_next=np.arange(n * 2, dtype=np.float32).reshape(n, 2) + 2,
    )
    buf, st = ReplayBuffer.from_data(data)
    assert buf.capacity == n and buf.num_envs == 1
    assert int(st.size[0]) == n
    batch, env_idx, pos = buf.sample(st, jax.random.key(1), 64)
    assert np.asarray(batch["act"]).max() < n
    # chronological view round-trips the dataset
    chron = buf.chronological(st)
    np.testing.assert_array_equal(np.asarray(chron["act"])[:, 0], data["act"])
