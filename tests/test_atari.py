"""Atari preprocessing chain against the deterministic fake-ALE double
(the reference's chain, ``examples/atari/atari_wrapper.py:22-412``, minus
ALE itself which is absent from this image).  Covers each wrapper's
semantics, the full ``wrap_deepmind`` composition, and the
frame-dedup memory contract (``save_only_last_obs`` + ``ignore_obs_next``
+ ``stack_num``) through the host collector into the replay buffer."""

import numpy as np
import pytest

from tianshou_tpu.envs.atari import (
    ClipRewardEnv,
    EpisodicLifeEnv,
    FakeAtariEnv,
    FrameStack,
    MaxAndSkipEnv,
    NoopResetEnv,
    WarpFrame,
    make_atari_env,
    wrap_deepmind,
)


def test_max_and_skip_pools_flicker():
    """The fake env blanks its sprite on odd steps (flicker); max-pool over
    the last two raw frames must recover it on every skip-step."""
    env = MaxAndSkipEnv(FakeAtariEnv(), skip=4)
    env.reset(seed=0)
    for _ in range(5):
        obs, rew, term, trunc, info = env.step(0)
        # sprite row present despite flicker
        assert obs[100:110].max() == 255


def test_episodic_life_terminates_per_life_but_resets_on_game_over():
    env = EpisodicLifeEnv(FakeAtariEnv(lives=3, life_len=10, max_steps=10_000))
    env.reset()
    # first life lost at t=10 -> terminated, but NOT a real game over
    terms = []
    for t in range(1, 11):
        _, _, term, trunc, _ = env.step(0)
        terms.append(term)
    assert terms[-1] and not any(terms[:-1])
    assert not env.was_real_done
    # reset() now must NOT reset the underlying game (lives stay at 2)
    env.reset()
    assert env.env._lives == 2 and env.env._t > 0
    # drain remaining lives -> real game over -> reset() truly resets
    for _ in range(25):
        _, _, term, _, _ = env.step(0)
        if term and env.was_real_done:
            break
    assert env.was_real_done
    env.reset()
    assert env.env._lives == 3 and env.env._t == 0


def test_noop_reset_advances_random_steps():
    env = NoopResetEnv(FakeAtariEnv(), noop_max=30)
    env.env.reset(seed=7)  # seed the rng deterministically
    env.reset()
    assert 1 <= env.env._t <= 30


def test_warp_frame_is_grayscale_84():
    env = WarpFrame(FakeAtariEnv())
    obs, _ = env.reset()
    assert obs.shape == (84, 84) and obs.dtype == np.uint8
    # cv2 luma of the uniform background: background value survives warp
    obs2, *_ = env.step(0)
    assert obs2.shape == (84, 84)


def test_clip_reward_sign():
    class R(FakeAtariEnv):
        def step(self, a):
            obs, r, te, tr, i = super().step(a)
            return obs, 3.7 if self._t % 2 else -0.5, te, tr, i

    env = ClipRewardEnv(R())
    env.reset()
    rs = {env.step(0)[1] for _ in range(4)}
    assert rs <= {-1.0, 0.0, 1.0} and len(rs) == 2


def test_frame_stack_channel_first():
    env = FrameStack(WarpFrame(FakeAtariEnv()), 4)
    obs, _ = env.reset()
    assert obs.shape == (4, 84, 84)
    # reset repeats the first frame
    assert np.array_equal(obs[0], obs[3])
    obs2, *_ = env.step(0)
    # stack shifts: last three of obs == first three of obs2
    assert np.array_equal(obs[1:], obs2[:3])


def test_wrap_deepmind_full_chain_shapes_and_types():
    env = wrap_deepmind(FakeAtariEnv(), frame_stack=4)
    obs, _ = env.reset(seed=3)
    assert obs.shape == (4, 84, 84) and obs.dtype == np.uint8
    total = 0.0
    for _ in range(30):
        obs, rew, term, trunc, _ = env.step(1)
        assert obs.shape == (4, 84, 84)
        assert rew in (-1.0, 0.0, 1.0)
        total += rew
        if term or trunc:
            env.reset()
    assert total > 0  # FIRE pressed -> rewards flowed through the chain


def test_make_atari_env_runs_dqn_segment_with_frame_dedup():
    """End-to-end: fake-ALE chain through HostVectorEnv + HostCollector
    into a replay buffer with the reference's Atari memory flags
    (``atari_dqn.py:141-148``), NatureCNN DQN acting — the exact program
    that runs on real ROMs the day ALE exists."""
    import jax

    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.host import space_from_gym
    from tianshou_tpu.networks.conv import ConvQNet

    train, test = make_atari_env(
        "fake", 2, 1, frame_stack=4, env_fn=lambda: FakeAtariEnv()
    )
    act_space = space_from_gym(train.action_space)
    algo = DQN(
        network=ConvQNet(num_actions=act_space.n, encoder="nature"),
        action_space=act_space,
        lr=1e-4, gamma=0.99, n_step=3, target_update_freq=500,
    )
    # one 84x84 frame stored per step, stack rebuilt at sample time
    buffer = ReplayBuffer(
        capacity=64, num_envs=2, stack_num=4,
        save_only_last_obs=True, ignore_obs_next=True,
    )
    col = HostCollector(algo, train, buffer)
    col.reset(seed=0)
    obs0 = col.obs
    assert obs0.shape == (2, 4, 84, 84)
    ts = algo.init(jax.random.key(0), jax.numpy.asarray(obs0[0]))
    _, _, traj = col.collect(
        ts, None, 1, jax.random.key(1), explore=True, explore_param=1.0,
        record_traj=True,
    )
    example = jax.tree.map(lambda x: jax.numpy.asarray(x)[0, 0], traj)
    bstate = buffer.init(example)
    bstate, stats, _ = col.collect(
        ts, bstate, 20, jax.random.key(1), explore=True, explore_param=1.0
    )
    assert stats.n_collected_steps == 40
    # dedup: the stored obs leaf is a single frame per slot, not the stack
    stored = np.asarray(bstate.storage["obs"])
    assert stored.shape == (2, 64, 84, 84)
    # sampling rebuilds [B, 4, 84, 84] stacks and a usable n-step batch
    sampled = algo.presample(buffer, bstate, jax.random.key(2), 16)
    _, _, _, batch, rew_chain, done_chain, term = sampled
    assert batch["obs"].shape == (16, 4, 84, 84)
    assert term["obs_next"].shape == (16, 4, 84, 84)
    assert rew_chain.shape == (16, 3)
    # and one update step runs
    ts2, _, metrics = algo.update_sampled(ts, buffer, bstate, sampled, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    train.close()
    test.close()


def test_episodic_life_reset_survives_noop_game_over():
    """If the lost-life no-op step itself hits game over, reset() must do
    a REAL reset (openai-baselines guard) instead of returning a terminal
    state (round-3 review finding)."""
    env = EpisodicLifeEnv(FakeAtariEnv(lives=2, life_len=1, max_steps=10_000))
    env.reset()
    _, _, term, _, _ = env.step(0)  # lives 2 -> 1: life-loss termination
    assert term and not env.was_real_done
    obs, _ = env.reset()  # no-op step drains the last life -> game over
    assert env.was_real_done  # promoted to a real done
    assert env.env._lives == 2 and env.env._t == 0  # truly reset
    # env is live: stepping works and reports a fresh life loss at t=1
    _, _, term2, _, _ = env.step(0)
    assert term2 and env.env._lives == 1
