"""Pure-JAX MinAtar-style pixel environments (Breakout, SpaceInvaders,
Freeway, Asterix, Seaquest — the full 5-game MinAtar suite).

The reference's Atari support is an external dependency stack (ALE +
``examples/atari/atari_wrapper.py`` preprocessing + EnvPool); the image here
has no ALE, and more importantly a CPU emulator is the wrong architecture for
TPU training — the device would starve behind a host emulator.  These
environments replicate the MinAtar benchmark family (Young & Tian, 2019,
arXiv 1903.03176): 10x10 multi-channel binary-pixel renditions of the Atari
games whose learning dynamics track the full-scale versions, implemented
from the published game descriptions as branchless fixed-shape ``jnp`` ops.
Thousands of instances step in lockstep under ``vmap`` inside the jitted
collector, and the pixel observations exercise the conv/MXU path
(``networks/conv.py``) exactly as Atari does for the reference
(``examples/atari/atari_dqn.py``).

Like MinAtar, each game supports *sticky actions* (the agent's action is
replaced by its previous action with probability ``sticky_prob``, default
0.1) as the standard stochasticity regularizer; episodes also truncate at
``max_steps`` so collection scans stay bounded.

Observations are ``[10, 10, C]`` float32 grids with one-hot entity channels
(channel meanings documented per game).  Actions are small ``Discrete``
spaces (per-game subsets of MinAtar's shared 6-action space).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.envs.base import JaxEnv, StepResult
from tianshou_tpu.envs.spaces import Box, Discrete

__all__ = ["Breakout", "SpaceInvaders", "Freeway", "Asterix", "Seaquest", "make_minatar"]

SIZE = 10


def _grid(*coords_vals) -> jax.Array:
    """Stack [10,10] channel planes into a [10,10,C] float32 observation."""
    return jnp.stack(coords_vals, axis=-1).astype(jnp.float32)


def _one_hot_plane(x: jax.Array, y: jax.Array, on: jax.Array | bool = True) -> jax.Array:
    """[10,10] plane with a single cell (y, x) set (row-major: axis0=y)."""
    plane = (jnp.arange(SIZE)[:, None] == y) & (jnp.arange(SIZE)[None, :] == x)
    return plane & jnp.asarray(on, bool)


class _StickyMixin:
    """Shared sticky-action + time-limit plumbing."""

    sticky_prob: float
    max_steps: int

    def _apply_sticky(self, key, action, last_action):
        if self.sticky_prob <= 0.0:
            return action
        stick = jax.random.uniform(key) < self.sticky_prob
        return jnp.where(stick, last_action, action).astype(jnp.int32)


# =====================================================================
# Breakout
# =====================================================================
class BreakoutState(NamedTuple):
    paddle_x: jax.Array  # int32, column of the paddle (row 9)
    ball_x: jax.Array
    ball_y: jax.Array
    ball_dx: jax.Array  # +-1
    ball_dy: jax.Array  # +-1
    trail_x: jax.Array  # previous ball cell (trail channel)
    trail_y: jax.Array
    bricks: jax.Array  # [10,10] bool
    last_action: jax.Array
    t: jax.Array
    key: jax.Array


class Breakout(_StickyMixin, JaxEnv):
    """MinAtar Breakout: 3 rows of bricks, diagonal ball, 1-cell paddle.

    Channels: 0=paddle, 1=ball, 2=trail (ball's previous cell, conveys
    direction), 3=brick.  Actions: 0=stay, 1=left, 2=right.
    Reward +1 per brick; episode ends when the ball passes the paddle row.
    Clearing all bricks respawns the wall (unbounded score like the paper).
    """

    action_space = Discrete(3)
    observation_space = Box(low=0.0, high=1.0, shape=(SIZE, SIZE, 4))
    BRICK_ROWS = (1, 2, 3)

    def __init__(self, sticky_prob: float = 0.1, max_steps: int = 1000):
        self.sticky_prob = sticky_prob
        self.max_steps = max_steps

    def _brick_wall(self) -> jax.Array:
        rows = jnp.zeros((SIZE,), bool).at[jnp.array(self.BRICK_ROWS)].set(True)
        return jnp.broadcast_to(rows[:, None], (SIZE, SIZE))

    def reset(self, key: jax.Array):
        key, k1 = jax.random.split(key)
        side = jax.random.bernoulli(k1)  # ball enters from left or right
        st = BreakoutState(
            paddle_x=jnp.asarray(SIZE // 2, jnp.int32),
            ball_x=jnp.where(side, SIZE - 1, 0).astype(jnp.int32),
            ball_y=jnp.asarray(4, jnp.int32),
            ball_dx=jnp.where(side, -1, 1).astype(jnp.int32),
            ball_dy=jnp.asarray(1, jnp.int32),
            trail_x=jnp.where(side, SIZE - 1, 0).astype(jnp.int32),
            trail_y=jnp.asarray(4, jnp.int32),
            bricks=self._brick_wall(),
            last_action=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
            key=key,
        )
        return st, self._obs(st)

    def _obs(self, s: BreakoutState) -> jax.Array:
        paddle = _one_hot_plane(s.paddle_x, jnp.asarray(SIZE - 1))
        ball = _one_hot_plane(s.ball_x, s.ball_y)
        trail = _one_hot_plane(s.trail_x, s.trail_y)
        return _grid(paddle, ball, trail, s.bricks)

    def step(self, state: BreakoutState, action: jax.Array):
        key, k_sticky = jax.random.split(state.key)
        action = self._apply_sticky(k_sticky, action, state.last_action)

        paddle_x = jnp.clip(
            state.paddle_x + jnp.where(action == 1, -1, 0) + jnp.where(action == 2, 1, 0),
            0,
            SIZE - 1,
        ).astype(jnp.int32)

        # ball advance with wall reflection on x and ceiling on y
        nx = state.ball_x + state.ball_dx
        dx = jnp.where((nx < 0) | (nx >= SIZE), -state.ball_dx, state.ball_dx)
        nx = jnp.clip(nx, 0, SIZE - 1)
        ny = state.ball_y + state.ball_dy
        dy = jnp.where(ny < 0, -state.ball_dy, state.ball_dy)
        ny = jnp.clip(ny, 0, SIZE - 1)

        # brick strike: remove brick, bounce back vertically, score
        hit_brick = state.bricks[ny, nx]
        bricks = state.bricks.at[ny, nx].set(
            jnp.where(hit_brick, False, state.bricks[ny, nx])
        )
        reward = hit_brick.astype(jnp.float32)
        dy = jnp.where(hit_brick, -dy, dy)
        ny = jnp.where(hit_brick, state.ball_y, ny)
        nx_after = jnp.where(hit_brick, state.ball_x, nx)

        # paddle interaction at the bottom row
        at_bottom = ny == SIZE - 1
        caught = at_bottom & (nx_after == paddle_x)
        dy = jnp.where(caught, -1, dy)
        terminated = at_bottom & ~caught

        # respawn the wall once cleared
        cleared = ~bricks.any()
        bricks = jnp.where(cleared, self._brick_wall(), bricks)

        t = state.t + 1
        truncated = (t >= self.max_steps) & ~terminated
        new = BreakoutState(
            paddle_x=paddle_x,
            ball_x=nx_after.astype(jnp.int32),
            ball_y=ny.astype(jnp.int32),
            ball_dx=dx.astype(jnp.int32),
            ball_dy=dy.astype(jnp.int32),
            trail_x=state.ball_x,
            trail_y=state.ball_y,
            bricks=bricks,
            last_action=action,
            t=t,
            key=key,
        )
        return new, StepResult(self._obs(new), reward, terminated, truncated)



# =====================================================================
# Space Invaders
# =====================================================================
class SpaceInvadersState(NamedTuple):
    pos: jax.Array  # cannon column (row 9)
    aliens: jax.Array  # [10,10] bool
    alien_dir: jax.Array  # +-1
    alien_move_timer: jax.Array
    alien_move_interval: jax.Array
    alien_shot_timer: jax.Array
    f_bullets: jax.Array  # [10,10] bool, friendly (move up)
    e_bullets: jax.Array  # [10,10] bool, enemy (move down)
    shot_cooldown: jax.Array
    ramp_index: jax.Array  # waves cleared (speeds up each wave)
    last_action: jax.Array
    t: jax.Array
    key: jax.Array


class SpaceInvaders(_StickyMixin, JaxEnv):
    """MinAtar Space Invaders: 6x4 alien block, side-to-side march with
    descent at the walls, random alien fire from the lowest alien of a
    column, player cannon with fire cooldown.

    Channels: 0=cannon, 1=alien, 2=alien-moving-left, 3=alien-moving-right,
    4=friendly bullet, 5=enemy bullet.  Actions: 0=noop, 1=left, 2=right,
    3=fire.  Reward +1 per alien destroyed; terminal when an alien reaches
    the cannon row or an enemy bullet hits the cannon.
    """

    action_space = Discrete(4)
    observation_space = Box(low=0.0, high=1.0, shape=(SIZE, SIZE, 6))
    SHOT_COOLDOWN = 5
    ENEMY_SHOT_INTERVAL = 10
    INITIAL_MOVE_INTERVAL = 12

    def __init__(self, sticky_prob: float = 0.1, max_steps: int = 1000):
        self.sticky_prob = sticky_prob
        self.max_steps = max_steps

    @staticmethod
    def _alien_block() -> jax.Array:
        a = jnp.zeros((SIZE, SIZE), bool)
        return a.at[1:5, 2:8].set(True)

    def reset(self, key: jax.Array):
        key, _ = jax.random.split(key)
        st = SpaceInvadersState(
            pos=jnp.asarray(SIZE // 2, jnp.int32),
            aliens=self._alien_block(),
            alien_dir=jnp.asarray(-1, jnp.int32),
            alien_move_timer=jnp.asarray(self.INITIAL_MOVE_INTERVAL, jnp.int32),
            alien_move_interval=jnp.asarray(self.INITIAL_MOVE_INTERVAL, jnp.int32),
            alien_shot_timer=jnp.asarray(self.ENEMY_SHOT_INTERVAL, jnp.int32),
            f_bullets=jnp.zeros((SIZE, SIZE), bool),
            e_bullets=jnp.zeros((SIZE, SIZE), bool),
            shot_cooldown=jnp.zeros((), jnp.int32),
            ramp_index=jnp.zeros((), jnp.int32),
            last_action=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
            key=key,
        )
        return st, self._obs(st)

    def _obs(self, s: SpaceInvadersState) -> jax.Array:
        cannon = _one_hot_plane(s.pos, jnp.asarray(SIZE - 1))
        left = s.aliens & (s.alien_dir < 0)
        right = s.aliens & (s.alien_dir > 0)
        return _grid(cannon, s.aliens, left, right, s.f_bullets, s.e_bullets)

    @staticmethod
    def _shift(plane: jax.Array, dy: jax.Array, dx: jax.Array) -> jax.Array:
        """Shift a [10,10] bool plane by (dy, dx), dropping cells that leave."""
        rolled = jnp.roll(plane, (dy, dx), axis=(0, 1))
        y = jnp.arange(SIZE)[:, None]
        x = jnp.arange(SIZE)[None, :]
        valid = (y - dy >= 0) & (y - dy < SIZE) & (x - dx >= 0) & (x - dx < SIZE)
        return rolled & valid

    def step(self, state: SpaceInvadersState, action: jax.Array):
        key, k_sticky, k_col = jax.random.split(state.key, 3)
        action = self._apply_sticky(k_sticky, action, state.last_action)

        pos = jnp.clip(
            state.pos + jnp.where(action == 1, -1, 0) + jnp.where(action == 2, 1, 0),
            0,
            SIZE - 1,
        ).astype(jnp.int32)

        # player fire (row above the cannon), rate-limited
        fire = (action == 3) & (state.shot_cooldown == 0)
        f_bullets = state.f_bullets.at[SIZE - 2, pos].set(
            state.f_bullets[SIZE - 2, pos] | fire
        )
        shot_cooldown = jnp.where(
            fire, self.SHOT_COOLDOWN, jnp.maximum(state.shot_cooldown - 1, 0)
        ).astype(jnp.int32)

        # bullets advance
        f_bullets = self._shift(f_bullets, -1, 0)
        e_bullets = self._shift(state.e_bullets, 1, 0)

        # alien march on its timer: sideways, descend + flip at walls
        move_now = state.alien_move_timer <= 0
        cols = state.aliens.any(axis=0)
        leftmost = jnp.argmax(cols)
        rightmost = SIZE - 1 - jnp.argmax(cols[::-1])
        at_wall = jnp.where(
            state.alien_dir < 0, leftmost == 0, rightmost == SIZE - 1
        )
        descend = move_now & at_wall
        side = move_now & ~at_wall
        aliens = jnp.where(
            side,
            self._shift(state.aliens, 0, state.alien_dir),
            jnp.where(descend, self._shift(state.aliens, 1, 0), state.aliens),
        )
        alien_dir = jnp.where(descend, -state.alien_dir, state.alien_dir).astype(
            jnp.int32
        )
        alien_move_timer = jnp.where(
            move_now, state.alien_move_interval, state.alien_move_timer - 1
        ).astype(jnp.int32)

        # alien fire: lowest alien of a uniformly random occupied column
        shoot_now = state.alien_shot_timer <= 0
        col_occ = aliens.any(axis=0)
        g = jax.random.gumbel(k_col, (SIZE,))
        shoot_col = jnp.argmax(jnp.where(col_occ, g, -jnp.inf))
        # lowest occupied row in that column
        col_cells = aliens[:, shoot_col]
        shoot_row = SIZE - 1 - jnp.argmax(col_cells[::-1])
        can_shoot = shoot_now & col_occ.any() & (shoot_row < SIZE - 1)
        e_bullets = e_bullets.at[shoot_row + 1, shoot_col].set(
            e_bullets[shoot_row + 1, shoot_col] | can_shoot
        )
        alien_shot_timer = jnp.where(
            shoot_now, self.ENEMY_SHOT_INTERVAL, state.alien_shot_timer - 1
        ).astype(jnp.int32)

        # friendly bullet x alien collisions
        hits = f_bullets & aliens
        reward = hits.sum().astype(jnp.float32)
        aliens = aliens & ~hits
        f_bullets = f_bullets & ~hits

        # terminal conditions
        shot_down = e_bullets[SIZE - 1, pos]
        invaded = aliens[SIZE - 1].any()
        terminated = shot_down | invaded

        # wave cleared: respawn faster block
        cleared = ~aliens.any()
        ramp_index = (state.ramp_index + cleared).astype(jnp.int32)
        new_interval = jnp.maximum(
            self.INITIAL_MOVE_INTERVAL - ramp_index, 2
        ).astype(jnp.int32)
        aliens = jnp.where(cleared, self._alien_block(), aliens)
        alien_move_interval = jnp.where(
            cleared, new_interval, state.alien_move_interval
        ).astype(jnp.int32)

        t = state.t + 1
        truncated = (t >= self.max_steps) & ~terminated
        new = SpaceInvadersState(
            pos=pos,
            aliens=aliens,
            alien_dir=alien_dir,
            alien_move_timer=alien_move_timer,
            alien_move_interval=alien_move_interval,
            alien_shot_timer=alien_shot_timer,
            f_bullets=f_bullets,
            e_bullets=e_bullets,
            shot_cooldown=shot_cooldown,
            ramp_index=ramp_index,
            last_action=action,
            t=t,
            key=key,
        )
        return new, StepResult(self._obs(new), reward, terminated, truncated)



# =====================================================================
# Freeway
# =====================================================================
class FreewayState(NamedTuple):
    player_y: jax.Array  # row; column fixed at 4
    car_x: jax.Array  # [8] float-free int positions, lanes = rows 1..8
    car_dir: jax.Array  # [8] +-1
    car_interval: jax.Array  # [8] steps between moves (speed)
    car_timer: jax.Array  # [8]
    move_cooldown: jax.Array  # player move rate limit
    last_action: jax.Array
    t: jax.Array
    key: jax.Array


class Freeway(_StickyMixin, JaxEnv):
    """MinAtar Freeway: cross 8 lanes of traffic from bottom to top.

    Channels: 0=chicken, 1=car, 2=car direction (signed, scaled by speed).
    Actions: 0=noop, 1=up, 2=down (rate-limited to every 3rd frame).
    Reward +1 on reaching the top row (position resets, car speeds
    re-randomized); collision knocks the player back to the start.
    Episodes truncate on the time limit (2500 in MinAtar).
    """

    action_space = Discrete(3)
    observation_space = Box(low=-1.0, high=1.0, shape=(SIZE, SIZE, 3))
    PLAYER_COL = 4
    MOVE_COOLDOWN = 3
    N_LANES = 8

    def __init__(self, sticky_prob: float = 0.1, max_steps: int = 2500):
        self.sticky_prob = sticky_prob
        self.max_steps = max_steps

    def _randomize_cars(self, key: jax.Array):
        k1, k2, k3 = jax.random.split(key, 3)
        x = jax.random.randint(k1, (self.N_LANES,), 0, SIZE)
        direction = jnp.where(
            jax.random.bernoulli(k2, shape=(self.N_LANES,)), 1, -1
        ).astype(jnp.int32)
        interval = jax.random.randint(k3, (self.N_LANES,), 1, 6)
        return x.astype(jnp.int32), direction, interval.astype(jnp.int32)

    def reset(self, key: jax.Array):
        key, k_cars = jax.random.split(key)
        car_x, car_dir, car_interval = self._randomize_cars(k_cars)
        st = FreewayState(
            player_y=jnp.asarray(SIZE - 1, jnp.int32),
            car_x=car_x,
            car_dir=car_dir,
            car_interval=car_interval,
            car_timer=car_interval,
            move_cooldown=jnp.zeros((), jnp.int32),
            last_action=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
            key=key,
        )
        return st, self._obs(st)

    def _obs(self, s: FreewayState) -> jax.Array:
        chicken = _one_hot_plane(jnp.asarray(self.PLAYER_COL), s.player_y)
        lanes = jnp.arange(1, self.N_LANES + 1)
        car = jnp.zeros((SIZE, SIZE), bool).at[lanes, s.car_x].set(True)
        speed = (s.car_dir / jnp.maximum(s.car_interval, 1)).astype(jnp.float32)
        dir_plane = jnp.zeros((SIZE, SIZE), jnp.float32).at[lanes, s.car_x].set(speed)
        return jnp.stack(
            [chicken.astype(jnp.float32), car.astype(jnp.float32), dir_plane], axis=-1
        )

    def step(self, state: FreewayState, action: jax.Array):
        key, k_sticky, k_cars = jax.random.split(state.key, 3)
        action = self._apply_sticky(k_sticky, action, state.last_action)

        can_move = state.move_cooldown == 0
        dy = jnp.where(action == 1, -1, 0) + jnp.where(action == 2, 1, 0)
        moved = can_move & (dy != 0)
        player_y = jnp.clip(state.player_y + jnp.where(moved, dy, 0), 0, SIZE - 1)
        move_cooldown = jnp.where(
            moved, self.MOVE_COOLDOWN, jnp.maximum(state.move_cooldown - 1, 0)
        ).astype(jnp.int32)

        # cars advance on their per-lane timers (wrap around)
        tick = state.car_timer <= 0
        car_x = jnp.where(tick, (state.car_x + state.car_dir) % SIZE, state.car_x)
        car_timer = jnp.where(tick, state.car_interval, state.car_timer - 1).astype(
            jnp.int32
        )

        # collision: a car occupies (lane row, player col) where the player is
        lanes = jnp.arange(1, self.N_LANES + 1)
        hit = ((car_x == self.PLAYER_COL) & (lanes == player_y)).any()
        player_y = jnp.where(hit, SIZE - 1, player_y).astype(jnp.int32)

        # success: reached top
        scored = player_y == 0
        reward = scored.astype(jnp.float32)
        player_y = jnp.where(scored, SIZE - 1, player_y).astype(jnp.int32)
        nx, nd, ni = self._randomize_cars(k_cars)
        car_x = jnp.where(scored, nx, car_x)
        car_dir = jnp.where(scored, nd, state.car_dir)
        car_interval = jnp.where(scored, ni, state.car_interval)
        car_timer = jnp.where(scored, ni, car_timer)

        t = state.t + 1
        truncated = t >= self.max_steps
        new = FreewayState(
            player_y=player_y,
            car_x=car_x.astype(jnp.int32),
            car_dir=car_dir.astype(jnp.int32),
            car_interval=car_interval.astype(jnp.int32),
            car_timer=car_timer.astype(jnp.int32),
            move_cooldown=move_cooldown,
            last_action=action,
            t=t,
            key=key,
        )
        return new, StepResult(
            self._obs(new), reward, jnp.zeros((), bool), truncated
        )



# =====================================================================
# Asterix
# =====================================================================
class AsterixState(NamedTuple):
    player_x: jax.Array
    player_y: jax.Array
    ent_exists: jax.Array  # [8] bool, one entity slot per row 1..8
    ent_x: jax.Array  # [8]
    ent_dir: jax.Array  # [8] +-1
    ent_gold: jax.Array  # [8] bool (gold=reward, otherwise enemy)
    spawn_timer: jax.Array
    move_timer: jax.Array
    move_interval: jax.Array
    ramp_timer: jax.Array
    last_action: jax.Array
    t: jax.Array
    key: jax.Array


class Asterix(_StickyMixin, JaxEnv):
    """MinAtar Asterix: collect gold, dodge enemies sweeping across lanes.

    Channels: 0=player, 1=enemy, 2=gold.  Actions: 0=noop, 1=left,
    2=right, 3=up, 4=down.  Entities spawn on a timer at a random lane/side
    (30% gold); entity speed ramps up over time.  Touching gold gives +1,
    touching an enemy ends the episode.
    """

    action_space = Discrete(5)
    observation_space = Box(low=0.0, high=1.0, shape=(SIZE, SIZE, 3))
    N_LANES = 8
    SPAWN_INTERVAL = 10
    INIT_MOVE_INTERVAL = 5
    RAMP_INTERVAL = 100

    def __init__(self, sticky_prob: float = 0.1, max_steps: int = 1000):
        self.sticky_prob = sticky_prob
        self.max_steps = max_steps

    def reset(self, key: jax.Array):
        key, _ = jax.random.split(key)
        n = self.N_LANES
        st = AsterixState(
            player_x=jnp.asarray(SIZE // 2, jnp.int32),
            player_y=jnp.asarray(SIZE // 2, jnp.int32),
            ent_exists=jnp.zeros((n,), bool),
            ent_x=jnp.zeros((n,), jnp.int32),
            ent_dir=jnp.ones((n,), jnp.int32),
            ent_gold=jnp.zeros((n,), bool),
            spawn_timer=jnp.asarray(self.SPAWN_INTERVAL, jnp.int32),
            move_timer=jnp.asarray(self.INIT_MOVE_INTERVAL, jnp.int32),
            move_interval=jnp.asarray(self.INIT_MOVE_INTERVAL, jnp.int32),
            ramp_timer=jnp.asarray(self.RAMP_INTERVAL, jnp.int32),
            last_action=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
            key=key,
        )
        return st, self._obs(st)

    def _obs(self, s: AsterixState) -> jax.Array:
        player = _one_hot_plane(s.player_x, s.player_y)
        lanes = jnp.arange(1, self.N_LANES + 1)
        enemy = (
            jnp.zeros((SIZE, SIZE), bool)
            .at[lanes, s.ent_x]
            .set(s.ent_exists & ~s.ent_gold)
        )
        gold = (
            jnp.zeros((SIZE, SIZE), bool).at[lanes, s.ent_x].set(s.ent_exists & s.ent_gold)
        )
        return _grid(player, enemy, gold)

    def _collide(self, player_x, player_y, s_exists, s_x, s_gold):
        lanes = jnp.arange(1, self.N_LANES + 1)
        touch = s_exists & (s_x == player_x) & (lanes == player_y)
        reward = (touch & s_gold).any().astype(jnp.float32)
        dead = (touch & ~s_gold).any()
        exists = s_exists & ~touch  # collected gold disappears
        return reward, dead, exists

    def step(self, state: AsterixState, action: jax.Array):
        key, k_sticky, k_lane, k_side, k_gold = jax.random.split(state.key, 5)
        action = self._apply_sticky(k_sticky, action, state.last_action)

        px = jnp.clip(
            state.player_x
            + jnp.where(action == 1, -1, 0)
            + jnp.where(action == 2, 1, 0),
            0,
            SIZE - 1,
        ).astype(jnp.int32)
        py = jnp.clip(
            state.player_y
            + jnp.where(action == 3, -1, 0)
            + jnp.where(action == 4, 1, 0),
            1,
            SIZE - 2,
        ).astype(jnp.int32)

        # collision before entity movement (player stepped into an entity)
        r1, dead1, exists = self._collide(
            px, py, state.ent_exists, state.ent_x, state.ent_gold
        )

        # entities advance on the shared timer; leaving the grid despawns
        tick = state.move_timer <= 0
        nx = state.ent_x + jnp.where(tick, state.ent_dir, 0)
        out = (nx < 0) | (nx >= SIZE)
        exists = exists & ~(out & tick)
        ent_x = jnp.clip(nx, 0, SIZE - 1).astype(jnp.int32)
        move_timer = jnp.where(
            tick, state.move_interval, state.move_timer - 1
        ).astype(jnp.int32)

        # collision after movement (entity stepped into the player)
        r2, dead2, exists = self._collide(px, py, exists, ent_x, state.ent_gold)

        # spawn: pick a random empty lane, random side, 30% gold
        spawn_now = state.spawn_timer <= 0
        g = jax.random.gumbel(k_lane, (self.N_LANES,))
        slot = jnp.argmax(jnp.where(~exists, g, -jnp.inf))
        any_free = (~exists).any()
        do_spawn = spawn_now & any_free
        from_left = jax.random.bernoulli(k_side)
        is_gold = jax.random.uniform(k_gold) < 0.3
        exists = exists.at[slot].set(exists[slot] | do_spawn)
        ent_x = ent_x.at[slot].set(
            jnp.where(do_spawn, jnp.where(from_left, 0, SIZE - 1), ent_x[slot])
        )
        ent_dir = state.ent_dir.at[slot].set(
            jnp.where(do_spawn, jnp.where(from_left, 1, -1), state.ent_dir[slot])
        )
        ent_gold = state.ent_gold.at[slot].set(
            jnp.where(do_spawn, is_gold, state.ent_gold[slot])
        )
        spawn_timer = jnp.where(
            spawn_now, self.SPAWN_INTERVAL, state.spawn_timer - 1
        ).astype(jnp.int32)

        # difficulty ramp
        ramp_now = state.ramp_timer <= 0
        move_interval = jnp.maximum(
            state.move_interval - ramp_now.astype(jnp.int32), 1
        )
        ramp_timer = jnp.where(
            ramp_now, self.RAMP_INTERVAL, state.ramp_timer - 1
        ).astype(jnp.int32)

        reward = r1 + r2
        terminated = dead1 | dead2
        t = state.t + 1
        truncated = (t >= self.max_steps) & ~terminated
        new = AsterixState(
            player_x=px,
            player_y=py,
            ent_exists=exists,
            ent_x=ent_x,
            ent_dir=ent_dir.astype(jnp.int32),
            ent_gold=ent_gold,
            spawn_timer=spawn_timer,
            move_timer=move_timer,
            move_interval=move_interval.astype(jnp.int32),
            ramp_timer=ramp_timer,
            last_action=action,
            t=t,
            key=key,
        )
        return new, StepResult(self._obs(new), reward, terminated, truncated)



# =====================================================================
# Seaquest
# =====================================================================
class SeaquestState(NamedTuple):
    sub_x: jax.Array
    sub_y: jax.Array  # 0 = surface row; 1..8 water lanes
    sub_or: jax.Array  # +-1 facing (bullet direction)
    f_bul_l: jax.Array  # [10,10] bool friendly bullets moving left
    f_bul_r: jax.Array
    e_bul_l: jax.Array  # [10,10] bool enemy bullets
    e_bul_r: jax.Array
    en_exists: jax.Array  # [8] enemy slots
    en_x: jax.Array
    en_y: jax.Array  # lane rows 1..8
    en_dir: jax.Array
    en_sub: jax.Array  # [8] bool: enemy submarine (shoots) vs fish
    dv_exists: jax.Array  # [4] diver slots
    dv_x: jax.Array
    dv_y: jax.Array
    dv_dir: jax.Array
    oxygen: jax.Array
    diver_count: jax.Array
    surfaced: jax.Array  # bool: already processed this surface visit
    shot_cd: jax.Array
    en_move_timer: jax.Array
    en_shot_timer: jax.Array
    en_spawn_timer: jax.Array
    en_spawn_interval: jax.Array  # ramps down on 6-diver surfacing
    dv_move_timer: jax.Array
    dv_spawn_timer: jax.Array
    last_action: jax.Array
    t: jax.Array
    key: jax.Array


class Seaquest(_StickyMixin, JaxEnv):
    """MinAtar Seaquest: pilot a submarine through 8 water lanes, shoot
    fish and enemy subs, rescue divers, and surface before oxygen runs
    out (Young & Tian 2019, the 5th game of the MinAtar suite).

    Mechanics (from the published description, slot-based fixed shapes):
    rows 1..8 are water lanes, row 0 the surface, row 9 the gauge row.
    Enemies (20% shooting submarines, else fish) and divers spawn on
    timers at a random free slot/lane/side and sweep horizontally.
    Firing (cooldown 5) launches a horizontal bullet in the facing
    direction; +1 per enemy destroyed.  Touching an enemy or an enemy
    bullet is terminal.  Oxygen (200) depletes every submerged frame;
    surfacing with no divers, or running dry, is terminal; surfacing
    with 6 divers banks ``oxygen*10//200`` reward, resets the divers and
    ramps enemy spawning; with 1-5 divers it silently drops one diver
    and refills oxygen.

    Channels: 0=sub, 1=sub trail (facing), 2=friendly bullet, 3=enemy
    bullet, 4=fish, 5=enemy sub, 6=diver, 7=oxygen gauge (row 9 left),
    8=diver gauge (row 9 right).  Actions (MinAtar order): 0=noop,
    1=left, 2=up, 3=right, 4=down, 5=fire.
    """

    action_space = Discrete(6)
    observation_space = Box(low=0.0, high=1.0, shape=(SIZE, SIZE, 9))
    MAX_OXYGEN = 200
    SHOT_COOLDOWN = 5
    ENEMY_SHOT_INTERVAL = 10
    ENEMY_MOVE_INTERVAL = 5
    DIVER_MOVE_INTERVAL = 5
    INIT_SPAWN_INTERVAL = 20
    MIN_SPAWN_INTERVAL = 10
    DIVER_SPAWN_INTERVAL = 30
    MAX_DIVERS = 6
    SUB_PROB = 0.2
    N_ENEMY = 8
    N_DIVER = 4

    def __init__(self, sticky_prob: float = 0.1, max_steps: int = 2500):
        self.sticky_prob = sticky_prob
        self.max_steps = max_steps

    def reset(self, key: jax.Array):
        key, _ = jax.random.split(key)
        ne, nd = self.N_ENEMY, self.N_DIVER
        st = SeaquestState(
            sub_x=jnp.asarray(SIZE // 2, jnp.int32),
            sub_y=jnp.asarray(0, jnp.int32),
            sub_or=jnp.asarray(1, jnp.int32),
            f_bul_l=jnp.zeros((SIZE, SIZE), bool),
            f_bul_r=jnp.zeros((SIZE, SIZE), bool),
            e_bul_l=jnp.zeros((SIZE, SIZE), bool),
            e_bul_r=jnp.zeros((SIZE, SIZE), bool),
            en_exists=jnp.zeros((ne,), bool),
            en_x=jnp.zeros((ne,), jnp.int32),
            en_y=jnp.ones((ne,), jnp.int32),
            en_dir=jnp.ones((ne,), jnp.int32),
            en_sub=jnp.zeros((ne,), bool),
            dv_exists=jnp.zeros((nd,), bool),
            dv_x=jnp.zeros((nd,), jnp.int32),
            dv_y=jnp.ones((nd,), jnp.int32),
            dv_dir=jnp.ones((nd,), jnp.int32),
            oxygen=jnp.asarray(self.MAX_OXYGEN, jnp.int32),
            diver_count=jnp.zeros((), jnp.int32),
            surfaced=jnp.asarray(True),  # starting on the surface row
            shot_cd=jnp.zeros((), jnp.int32),
            en_move_timer=jnp.asarray(self.ENEMY_MOVE_INTERVAL, jnp.int32),
            en_shot_timer=jnp.asarray(self.ENEMY_SHOT_INTERVAL, jnp.int32),
            en_spawn_timer=jnp.asarray(self.INIT_SPAWN_INTERVAL, jnp.int32),
            en_spawn_interval=jnp.asarray(self.INIT_SPAWN_INTERVAL, jnp.int32),
            dv_move_timer=jnp.asarray(self.DIVER_MOVE_INTERVAL, jnp.int32),
            dv_spawn_timer=jnp.asarray(self.DIVER_SPAWN_INTERVAL, jnp.int32),
            last_action=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
            key=key,
        )
        return st, self._obs(st)

    def _slot_plane(self, exists, x, y) -> jax.Array:
        return jnp.zeros((SIZE, SIZE), bool).at[y, x].max(exists)

    def _obs(self, s: SeaquestState) -> jax.Array:
        sub = _one_hot_plane(s.sub_x, s.sub_y)
        trail = _one_hot_plane(
            jnp.clip(s.sub_x - s.sub_or, 0, SIZE - 1), s.sub_y
        )
        f_bul = s.f_bul_l | s.f_bul_r
        e_bul = s.e_bul_l | s.e_bul_r
        fish = self._slot_plane(s.en_exists & ~s.en_sub, s.en_x, s.en_y)
        esub = self._slot_plane(s.en_exists & s.en_sub, s.en_x, s.en_y)
        diver = self._slot_plane(s.dv_exists, s.dv_x, s.dv_y)
        # gauges live on row 9: oxygen fills left-to-right, divers
        # right-to-left (the MinAtar dashboard convention)
        cols = jnp.arange(SIZE)
        ox_cells = (s.oxygen * SIZE) // self.MAX_OXYGEN
        ox_plane = jnp.zeros((SIZE, SIZE), bool).at[SIZE - 1].set(cols < ox_cells)
        dv_plane = (
            jnp.zeros((SIZE, SIZE), bool)
            .at[SIZE - 1]
            .set(cols >= SIZE - s.diver_count)
        )
        return _grid(sub, trail, f_bul, e_bul, fish, esub, diver, ox_plane, dv_plane)

    @staticmethod
    def _shift_x(plane: jax.Array, dx: int) -> jax.Array:
        return SpaceInvaders._shift(plane, jnp.asarray(0), jnp.asarray(dx))

    def step(self, state: SeaquestState, action: jax.Array):
        key, k_sticky, k_slot, k_lane, k_side, k_kind, k_dslot, k_dlane, k_dside = (
            jax.random.split(state.key, 9)
        )
        action = self._apply_sticky(k_sticky, action, state.last_action)

        # -- submarine move + facing (row 9 is the gauge row, y <= 8)
        dx = jnp.where(action == 1, -1, 0) + jnp.where(action == 3, 1, 0)
        dy = jnp.where(action == 2, -1, 0) + jnp.where(action == 4, 1, 0)
        sub_x = jnp.clip(state.sub_x + dx, 0, SIZE - 1).astype(jnp.int32)
        sub_y = jnp.clip(state.sub_y + dy, 0, SIZE - 2).astype(jnp.int32)
        sub_or = jnp.where(dx != 0, jnp.sign(dx), state.sub_or).astype(jnp.int32)

        # -- fire (rate-limited, horizontal, facing direction)
        fire = (action == 5) & (state.shot_cd == 0)
        f_bul_l = state.f_bul_l.at[sub_y, sub_x].max(fire & (sub_or < 0))
        f_bul_r = state.f_bul_r.at[sub_y, sub_x].max(fire & (sub_or > 0))
        shot_cd = jnp.where(
            fire, self.SHOT_COOLDOWN, jnp.maximum(state.shot_cd - 1, 0)
        ).astype(jnp.int32)

        # -- bullets advance
        f_bul_l = self._shift_x(f_bul_l, -1)
        f_bul_r = self._shift_x(f_bul_r, 1)
        e_bul_l = self._shift_x(state.e_bul_l, -1)
        e_bul_r = self._shift_x(state.e_bul_r, 1)

        # -- enemies advance on the shared timer; off-grid despawns
        tick = state.en_move_timer <= 0
        nx = state.en_x + jnp.where(tick, state.en_dir, 0)
        out = (nx < 0) | (nx >= SIZE)
        en_exists = state.en_exists & ~(out & tick)
        en_x = jnp.clip(nx, 0, SIZE - 1).astype(jnp.int32)
        en_move_timer = jnp.where(
            tick, self.ENEMY_MOVE_INTERVAL, state.en_move_timer - 1
        ).astype(jnp.int32)

        # -- friendly bullet hits (after both moved): +1 per enemy
        f_bul = f_bul_l | f_bul_r
        hit = en_exists & f_bul[state.en_y, en_x]
        reward = hit.sum().astype(jnp.float32)
        en_exists = en_exists & ~hit
        # consume the bullet cells that struck
        strike = self._slot_plane(hit, en_x, state.en_y)
        f_bul_l = f_bul_l & ~strike
        f_bul_r = f_bul_r & ~strike

        # -- enemy subs fire on the shared timer (from their post-move cell)
        shoot = state.en_shot_timer <= 0
        subs = en_exists & state.en_sub & shoot
        e_bul_l = e_bul_l | self._slot_plane(subs & (state.en_dir < 0), en_x, state.en_y)
        e_bul_r = e_bul_r | self._slot_plane(subs & (state.en_dir > 0), en_x, state.en_y)
        en_shot_timer = jnp.where(
            shoot, self.ENEMY_SHOT_INTERVAL, state.en_shot_timer - 1
        ).astype(jnp.int32)

        # -- enemy spawn: random free slot / lane / side, 20% shooting sub
        spawn = (state.en_spawn_timer <= 0) & (~en_exists).any()
        g = jax.random.gumbel(k_slot, (self.N_ENEMY,))
        slot = jnp.argmax(jnp.where(~en_exists, g, -jnp.inf))
        lane = jax.random.randint(k_lane, (), 1, 9)
        from_left = jax.random.bernoulli(k_side)
        is_sub = jax.random.uniform(k_kind) < self.SUB_PROB
        en_exists = en_exists.at[slot].set(en_exists[slot] | spawn)
        en_x = en_x.at[slot].set(
            jnp.where(spawn, jnp.where(from_left, 0, SIZE - 1), en_x[slot])
        )
        en_y = state.en_y.at[slot].set(jnp.where(spawn, lane, state.en_y[slot]))
        en_dir = state.en_dir.at[slot].set(
            jnp.where(spawn, jnp.where(from_left, 1, -1), state.en_dir[slot])
        )
        en_sub = state.en_sub.at[slot].set(
            jnp.where(spawn, is_sub, state.en_sub[slot])
        )
        en_spawn_timer = jnp.where(
            state.en_spawn_timer <= 0,
            state.en_spawn_interval,
            state.en_spawn_timer - 1,
        ).astype(jnp.int32)

        # -- divers advance / spawn / get collected
        dtick = state.dv_move_timer <= 0
        dnx = state.dv_x + jnp.where(dtick, state.dv_dir, 0)
        dout = (dnx < 0) | (dnx >= SIZE)
        dv_exists = state.dv_exists & ~(dout & dtick)
        dv_x = jnp.clip(dnx, 0, SIZE - 1).astype(jnp.int32)
        dv_move_timer = jnp.where(
            dtick, self.DIVER_MOVE_INTERVAL, state.dv_move_timer - 1
        ).astype(jnp.int32)
        dspawn = (state.dv_spawn_timer <= 0) & (~dv_exists).any()
        dg = jax.random.gumbel(k_dslot, (self.N_DIVER,))
        dslot = jnp.argmax(jnp.where(~dv_exists, dg, -jnp.inf))
        dlane = jax.random.randint(k_dlane, (), 1, 9)
        d_left = jax.random.bernoulli(k_dside)
        dv_exists = dv_exists.at[dslot].set(dv_exists[dslot] | dspawn)
        dv_x = dv_x.at[dslot].set(
            jnp.where(dspawn, jnp.where(d_left, 0, SIZE - 1), dv_x[dslot])
        )
        dv_y = state.dv_y.at[dslot].set(jnp.where(dspawn, dlane, state.dv_y[dslot]))
        dv_dir = state.dv_dir.at[dslot].set(
            jnp.where(dspawn, jnp.where(d_left, 1, -1), state.dv_dir[dslot])
        )
        dv_spawn_timer = jnp.where(
            state.dv_spawn_timer <= 0,
            self.DIVER_SPAWN_INTERVAL,
            state.dv_spawn_timer - 1,
        ).astype(jnp.int32)
        caught = dv_exists & (dv_x == sub_x) & (dv_y == sub_y)
        # collect only as many as the gauge has room for (slot order);
        # divers beyond capacity stay on the board uncollected
        space_left = self.MAX_DIVERS - state.diver_count
        order = jnp.cumsum(caught.astype(jnp.int32)) - caught.astype(jnp.int32)
        collect = caught & (order < space_left)
        diver_count = (state.diver_count + collect.sum()).astype(jnp.int32)
        dv_exists = dv_exists & ~collect

        # -- lethal contacts
        hit_enemy = (en_exists & (en_x == sub_x) & (en_y == sub_y)).any()
        hit_bullet = (e_bul_l | e_bul_r)[sub_y, sub_x]

        # -- oxygen / surfacing
        submerged = sub_y > 0
        oxygen = jnp.where(submerged, state.oxygen - 1, state.oxygen).astype(
            jnp.int32
        )
        out_of_air = oxygen < 0
        fresh_surface = ~submerged & ~state.surfaced
        drowned_crew = fresh_surface & (diver_count == 0)
        banked = fresh_surface & (diver_count == self.MAX_DIVERS)
        reward += jnp.where(
            banked, (oxygen * 10 // self.MAX_OXYGEN).astype(jnp.float32), 0.0
        )
        dropped = fresh_surface & ~banked & (diver_count > 0)
        diver_count = jnp.where(
            banked, 0, diver_count - dropped.astype(jnp.int32)
        ).astype(jnp.int32)
        en_spawn_interval = jnp.where(
            banked,
            jnp.maximum(state.en_spawn_interval - 1, self.MIN_SPAWN_INTERVAL),
            state.en_spawn_interval,
        ).astype(jnp.int32)
        oxygen = jnp.where(
            fresh_surface & (diver_count >= 0) & ~drowned_crew,
            self.MAX_OXYGEN,
            oxygen,
        ).astype(jnp.int32)
        surfaced = ~submerged

        terminated = hit_enemy | hit_bullet | out_of_air | drowned_crew
        t = state.t + 1
        truncated = (t >= self.max_steps) & ~terminated
        new = SeaquestState(
            sub_x=sub_x,
            sub_y=sub_y,
            sub_or=sub_or,
            f_bul_l=f_bul_l,
            f_bul_r=f_bul_r,
            e_bul_l=e_bul_l,
            e_bul_r=e_bul_r,
            en_exists=en_exists,
            en_x=en_x,
            en_y=en_y,
            en_dir=en_dir.astype(jnp.int32),
            en_sub=en_sub,
            dv_exists=dv_exists,
            dv_x=dv_x,
            dv_y=dv_y,
            dv_dir=dv_dir.astype(jnp.int32),
            oxygen=oxygen,
            diver_count=diver_count,
            surfaced=surfaced,
            shot_cd=shot_cd,
            en_move_timer=en_move_timer,
            en_shot_timer=en_shot_timer,
            en_spawn_timer=en_spawn_timer,
            en_spawn_interval=en_spawn_interval,
            dv_move_timer=dv_move_timer,
            dv_spawn_timer=dv_spawn_timer,
            last_action=action,
            t=t,
            key=key,
        )
        return new, StepResult(self._obs(new), reward, terminated, truncated)


_REGISTRY = {
    "breakout": Breakout,
    "space_invaders": SpaceInvaders,
    "freeway": Freeway,
    "asterix": Asterix,
    "seaquest": Seaquest,
}


def make_minatar(name: str, **kwargs) -> JaxEnv:
    """Create a MinAtar-style env by name (``MinAtar/Breakout`` also ok)."""
    key = name.lower().removeprefix("minatar/").removeprefix("minatar-")
    key = key.replace("-", "_")
    if key not in _REGISTRY:
        raise ValueError(f"unknown MinAtar env {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[key](**kwargs)
