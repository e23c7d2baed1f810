"""DeepMind-style Atari preprocessing for the host-env bridge.

The preprocessing chain of the reference's flagship pixel pipeline
(``examples/atari/atari_wrapper.py:22-412``), rebuilt on the modern
gymnasium 5-tuple API for :class:`HostVectorEnv`:

``NoopResetEnv`` (random no-ops on reset) -> ``MaxAndSkipEnv`` (frame-skip
with 2-frame max-pool) -> ``EpisodicLifeEnv`` (life loss terminates, reset
only on true game over) -> ``FireResetEnv`` -> ``WarpFrame`` (grayscale +
84x84 area resize, exactly the reference's cv2 calls) ->
``ScaledFloatFrame`` (optional) -> ``ClipRewardEnv`` (sign) ->
``FrameStack`` (channel-first ``[stack, H, W]``).

Memory contract: the frame-stacked observations pair with the replay
buffer's ``save_only_last_obs=True`` + ``ignore_obs_next=True`` +
``stack_num=k`` so each 84x84 frame is stored exactly ONCE
(``data/buffer.py:74-123``; reference ``atari_dqn.py:141-148``).

ALE itself is not in this image; :func:`make_atari_env` uses gymnasium's
registry and raises a clear error if the ROMs are missing.  The
deterministic :class:`FakeAtariEnv` double (210x160x3 frames, lives,
FIRE/NOOP action meanings) stands in for ALE in tests and lets the whole
chain be exercised today; real Atari runs work the moment ``ale_py`` +
ROMs are installed.
"""

from __future__ import annotations

from collections import deque
from typing import Any

import numpy as np

__all__ = [
    "NoopResetEnv",
    "MaxAndSkipEnv",
    "EpisodicLifeEnv",
    "FireResetEnv",
    "WarpFrame",
    "ScaledFloatFrame",
    "ClipRewardEnv",
    "FrameStack",
    "wrap_deepmind",
    "make_atari_env",
    "FakeAtariEnv",
]


def _gym():
    import gymnasium as gym

    return gym


class NoopResetEnv:
    """Sample initial states with 1..noop_max random no-op actions on reset
    (reference ``atari_wrapper.py:56-88``; no-op is action 0)."""

    def __init__(self, env, noop_max: int = 30):
        self.env = env
        self.noop_max = noop_max
        self.noop_action = 0
        meanings = env.unwrapped.get_action_meanings()
        assert meanings[0] == "NOOP"

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        noops = int(self.env.unwrapped.np_random.integers(1, self.noop_max + 1))
        for _ in range(noops):
            obs, _, term, trunc, info = self.env.step(self.noop_action)
            if term or trunc:
                obs, info = self.env.reset()
        return obs, info

    def step(self, action):
        return self.env.step(action)


class MaxAndSkipEnv:
    """Repeat the action ``skip`` times, sum rewards, max-pool the last two
    raw frames (reference ``atari_wrapper.py:91-125``; removes ALE's
    sprite flicker)."""

    def __init__(self, env, skip: int = 4):
        self.env = env
        self._skip = skip

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)

    def step(self, action):
        obs_list, total_reward = [], 0.0
        term = trunc = False
        info: dict = {}
        for _ in range(self._skip):
            obs, reward, term, trunc, info = self.env.step(action)
            obs_list.append(obs)
            total_reward += float(reward)
            if term or trunc:
                break
        max_frame = np.max(obs_list[-2:], axis=0)
        return max_frame, total_reward, term, trunc, info


class EpisodicLifeEnv:
    """Life loss terminates the episode; the underlying game resets only on
    true game over (reference ``atari_wrapper.py:128-183``)."""

    def __init__(self, env):
        self.env = env
        self.lives = 0
        self.was_real_done = True

    def __getattr__(self, name):
        return getattr(self.env, name)

    def step(self, action):
        obs, reward, term, trunc, info = self.env.step(action)
        self.was_real_done = term or trunc
        lives = self.env.unwrapped.ale.lives()
        # keep lives > 0 guard: Qbert can sit at lives == 0 for a few
        # frames; only the real game-over resets
        if 0 < lives < self.lives:
            term = True
        self.lives = lives
        return obs, float(reward), term, trunc, info

    def reset(self, **kwargs):
        if self.was_real_done:
            obs, info = self.env.reset(**kwargs)
        else:
            # no-op step to advance past the lost-life state; if that very
            # step ends the underlying episode (game over / time limit on
            # the no-op frame), a real reset is required — otherwise the
            # env is left in a terminal state (openai-baselines guard)
            obs, _, term, trunc, info = self.env.step(0)
            if term or trunc:
                obs, info = self.env.reset(**kwargs)
                self.was_real_done = True
        self.lives = self.env.unwrapped.ale.lives()
        return obs, info


class FireResetEnv:
    """Press FIRE on reset for games that wait for it (reference
    ``atari_wrapper.py:186-201``)."""

    def __init__(self, env):
        self.env = env
        meanings = env.unwrapped.get_action_meanings()
        assert meanings[1] == "FIRE" and len(meanings) >= 3

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        self.env.reset(**kwargs)
        obs, _, term, trunc, info = self.env.step(1)
        if term or trunc:
            obs, info = self.env.reset(**kwargs)
        return obs, info

    def step(self, action):
        return self.env.step(action)


class WarpFrame:
    """Grayscale + 84x84 INTER_AREA resize, the Nature-paper warp with the
    reference's exact cv2 calls (``atari_wrapper.py:204-226``)."""

    def __init__(self, env, size: int = 84):
        self.env = env
        self.size = size
        gym = _gym()
        self.observation_space = gym.spaces.Box(
            low=0, high=255, shape=(size, size), dtype=np.uint8
        )

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _warp(self, frame: np.ndarray) -> np.ndarray:
        import cv2

        frame = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
        return cv2.resize(
            frame, (self.size, self.size), interpolation=cv2.INTER_AREA
        )

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        return self._warp(obs), info

    def step(self, action):
        obs, reward, term, trunc, info = self.env.step(action)
        return self._warp(obs), reward, term, trunc, info


class ScaledFloatFrame:
    """Normalize uint8 frames to [0, 1] float32 (reference
    ``atari_wrapper.py:229-250``; off by default — quadruples buffer
    memory)."""

    def __init__(self, env):
        self.env = env
        gym = _gym()
        shape = env.observation_space.shape
        self.observation_space = gym.spaces.Box(
            low=0.0, high=1.0, shape=shape, dtype=np.float32
        )

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        return np.asarray(obs, np.float32) / 255.0, info

    def step(self, action):
        obs, reward, term, trunc, info = self.env.step(action)
        return np.asarray(obs, np.float32) / 255.0, reward, term, trunc, info


class ClipRewardEnv:
    """Clip rewards to their sign (reference ``atari_wrapper.py:253-264``)."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)

    def step(self, action):
        obs, reward, term, trunc, info = self.env.step(action)
        return obs, float(np.sign(float(reward))), term, trunc, info


class FrameStack:
    """Stack the last ``n_frames`` observations channel-first ``[k, H, W]``
    (reference ``atari_wrapper.py:267-318``)."""

    def __init__(self, env, n_frames: int = 4):
        self.env = env
        self.n_frames = n_frames
        self.frames: deque = deque([], maxlen=n_frames)
        gym = _gym()
        space = env.observation_space
        self.observation_space = gym.spaces.Box(
            low=float(np.min(space.low)),
            high=float(np.max(space.high)),
            shape=(n_frames, *space.shape),
            dtype=space.dtype,
        )

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        for _ in range(self.n_frames):
            self.frames.append(obs)
        return self._get_ob(), info

    def step(self, action):
        obs, reward, term, trunc, info = self.env.step(action)
        self.frames.append(obs)
        return self._get_ob(), reward, term, trunc, info

    def _get_ob(self):
        return np.stack(self.frames, axis=0)


def wrap_deepmind(
    env,
    episode_life: bool = True,
    clip_rewards: bool = True,
    frame_stack: int = 4,
    scale: bool = False,
    warp_frame: bool = True,
):
    """The full DeepMind chain (reference ``atari_wrapper.py:321-369``):
    noop-reset, 4-frame max-skip, optional episodic life, FIRE reset when
    the game needs it, 84x84 grayscale warp, optional [0,1] scaling, sign
    reward clip, k-frame channel-first stack."""
    env = NoopResetEnv(env, noop_max=30)
    env = MaxAndSkipEnv(env, skip=4)
    if episode_life:
        env = EpisodicLifeEnv(env)
    if "FIRE" in env.unwrapped.get_action_meanings():
        env = FireResetEnv(env)
    if warp_frame:
        env = WarpFrame(env)
    if scale:
        env = ScaledFloatFrame(env)
    if clip_rewards:
        env = ClipRewardEnv(env)
    if frame_stack:
        env = FrameStack(env, frame_stack)
    return env


def make_atari_env(
    task: str,
    num_train_envs: int,
    num_test_envs: int,
    *,
    frame_stack: int = 4,
    scale: bool = False,
    env_fn=None,
):
    """(train HostVectorEnv, test HostVectorEnv) over the wrapped chain —
    the analog of ``make_atari_env`` (``atari_wrapper.py:372-389``);
    training envs use episodic life + reward clipping, test envs the raw
    episode semantics.  ``env_fn`` overrides the base-env constructor (the
    fake-ALE double in tests; ``gym.make(task)`` needs ``ale_py`` + ROMs).
    """
    from tianshou_tpu.envs.host import HostVectorEnv

    if env_fn is None:
        def env_fn():
            gym = _gym()
            try:
                return gym.make(task, frameskip=1)
            except Exception as e:  # pragma: no cover - depends on image
                raise RuntimeError(
                    f"cannot construct Atari env {task!r}: ALE (ale_py + "
                    f"ROMs) is not installed in this image ({e}); pass "
                    f"env_fn= or install ale_py"
                ) from e

    def train_fn():
        return wrap_deepmind(
            env_fn(), episode_life=True, clip_rewards=True,
            frame_stack=frame_stack, scale=scale,
        )

    def test_fn():
        return wrap_deepmind(
            env_fn(), episode_life=False, clip_rewards=False,
            frame_stack=frame_stack, scale=scale,
        )

    train = HostVectorEnv([train_fn for _ in range(num_train_envs)])
    test = HostVectorEnv([test_fn for _ in range(num_test_envs)])
    return train, test


# ---------------------------------------------------------------------------
class _FakeALE:
    def __init__(self, env):
        self._env = env

    def lives(self) -> int:
        return self._env._lives


class FakeAtariEnv:
    """Deterministic ALE double: 210x160x3 uint8 frames, NOOP/FIRE/moves,
    lives that drain on a fixed schedule — enough surface for every wrapper
    above (``get_action_meanings``, ``ale.lives``, ``np_random``) so the
    full preprocessing chain runs and is testable without ROMs.

    Dynamics: a paddle column tracks the action; frame content is a
    deterministic function of (step, paddle) so tests can assert exact
    pixel outcomes.  Reward +1 every ``reward_every`` steps after FIRE has
    been pressed; one life lost every ``life_len`` steps; game over when
    ``lives`` reach zero; truncation at ``max_steps``.
    """

    metadata: dict = {}

    def __init__(
        self,
        lives: int = 3,
        life_len: int = 25,
        reward_every: int = 7,
        max_steps: int = 400,
        seed: int = 0,
    ):
        gym = _gym()
        self.observation_space = gym.spaces.Box(
            low=0, high=255, shape=(210, 160, 3), dtype=np.uint8
        )
        self.action_space = gym.spaces.Discrete(6)
        self._start_lives = lives
        self.life_len = life_len
        self.reward_every = reward_every
        self.max_steps = max_steps
        self.np_random = np.random.default_rng(seed)
        self.ale = _FakeALE(self)
        self.unwrapped = self
        self._lives = lives
        self._t = 0
        self._paddle = 80
        self._fired = False

    def get_action_meanings(self):
        return ["NOOP", "FIRE", "UP", "RIGHT", "LEFT", "DOWN"]

    def _frame(self) -> np.ndarray:
        # flicker: odd steps blank the sprite rows (what max-pool removes)
        obs = np.full((210, 160, 3), (self._t * 3) % 32, np.uint8)
        if self._t % 2 == 0:
            obs[100:110, self._paddle : self._paddle + 8] = 255
        obs[0:10, : 16 * self._lives] = 200  # lives indicator strip
        return obs

    def reset(self, *, seed=None, options=None):
        if seed is not None:
            self.np_random = np.random.default_rng(seed)
        self._lives = self._start_lives
        self._t = 0
        self._paddle = 80
        self._fired = False
        return self._frame(), {}

    def step(self, action):
        action = int(action)
        self._t += 1
        if action == 1:
            self._fired = True
        elif action == 3:
            self._paddle = min(self._paddle + 4, 152)
        elif action == 4:
            self._paddle = max(self._paddle - 4, 0)
        reward = (
            1.0
            if self._fired and self._t % self.reward_every == 0
            else 0.0
        )
        if self._t % self.life_len == 0:
            self._lives -= 1
        terminated = self._lives <= 0
        truncated = self._t >= self.max_steps and not terminated
        return self._frame(), reward, terminated, truncated, {}

    def close(self):
        pass
