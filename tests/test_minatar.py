"""MinAtar-style pixel envs + conv networks.

Analog of the reference's Atari stack tests: the reference exercises its
Atari path through ``examples/atari/atari_wrapper.py`` preprocessing and
frame-stack collector tests (``test/base/test_collector.py``); here the
envs themselves are pure JAX, so we check game mechanics directly and
verify the conv/MXU networks and the jitted collector compose with them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.envs import VectorEnv, make_env
from tianshou_tpu.envs.minatar import (
    Asterix,
    Breakout,
    Freeway,
    Seaquest,
    SpaceInvaders,
    make_minatar,
)
from tianshou_tpu.networks import ConvDuelingQNet, ConvQNet, MinAtarCNN, NatureCNN

ALL_GAMES = ["breakout", "space_invaders", "freeway", "asterix", "seaquest"]


@pytest.mark.parametrize("name", ALL_GAMES)
def test_reset_step_shapes_and_ranges(name):
    env = make_minatar(name, sticky_prob=0.0)
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == env.observation_space.shape
    assert obs.dtype == jnp.float32
    for i in range(20):
        act = env.action_space.sample(jax.random.key(i))
        state, res = env.step(state, act)
        assert res.obs.shape == env.observation_space.shape
        assert res.reward.shape == ()
        assert res.terminated.dtype == bool and res.truncated.dtype == bool
        lo, hi = env.observation_space.low, env.observation_space.high
        assert float(res.obs.min()) >= float(np.min(lo)) - 1e-6
        assert float(res.obs.max()) <= float(np.max(hi)) + 1e-6


@pytest.mark.parametrize("name", ALL_GAMES)
def test_determinism(name):
    env = make_minatar(name)  # sticky on: randomness must come from the key
    s1, o1 = env.reset(jax.random.key(7))
    s2, o2 = env.reset(jax.random.key(7))
    np.testing.assert_array_equal(o1, o2)
    for i in range(15):
        act = env.action_space.sample(jax.random.key(100 + i))
        s1, r1 = env.step(s1, act)
        s2, r2 = env.step(s2, act)
        np.testing.assert_array_equal(r1.obs, r2.obs)
        assert float(r1.reward) == float(r2.reward)


def test_make_env_dispatches_minatar():
    env = make_env("MinAtar/Breakout")
    assert isinstance(env, Breakout)
    assert isinstance(make_env("minatar/space-invaders"), SpaceInvaders)
    with pytest.raises(ValueError):
        make_minatar("minatar/pong")


def test_breakout_brick_hit_scores_and_bounces():
    env = Breakout(sticky_prob=0.0)
    state, _ = env.reset(jax.random.key(0))
    # place the ball just below the brick wall moving up into row 3
    state = state._replace(
        ball_x=jnp.asarray(5, jnp.int32),
        ball_y=jnp.asarray(4, jnp.int32),
        ball_dx=jnp.asarray(1, jnp.int32),
        ball_dy=jnp.asarray(-1, jnp.int32),
    )
    assert bool(state.bricks[3, 6])
    new, res = env.step(state, jnp.asarray(0))
    assert float(res.reward) == 1.0
    assert not bool(new.bricks[3, 6])
    assert int(new.ball_dy) == 1  # bounced back down


def test_breakout_terminates_when_ball_passes_paddle():
    env = Breakout(sticky_prob=0.0)
    state, _ = env.reset(jax.random.key(0))
    # ball one row above the bottom, heading down, paddle far away
    state = state._replace(
        ball_x=jnp.asarray(2, jnp.int32),
        ball_y=jnp.asarray(8, jnp.int32),
        ball_dx=jnp.asarray(1, jnp.int32),
        ball_dy=jnp.asarray(1, jnp.int32),
        paddle_x=jnp.asarray(9, jnp.int32),
    )
    _, res = env.step(state, jnp.asarray(0))
    assert bool(res.terminated)
    # same setup but paddle under the ball: caught, keeps going
    state = state._replace(paddle_x=jnp.asarray(3, jnp.int32))
    new, res = env.step(state, jnp.asarray(0))
    assert not bool(res.terminated)
    assert int(new.ball_dy) == -1


def test_space_invaders_shoot_alien():
    env = SpaceInvaders(sticky_prob=0.0)
    state, _ = env.reset(jax.random.key(0))
    # drop a friendly bullet just below the alien block's bottom row (row 4)
    fb = state.f_bullets.at[5, 4].set(True)
    state = state._replace(f_bullets=fb)
    assert bool(state.aliens[4, 4])
    new, res = env.step(state, jnp.asarray(0))
    assert float(res.reward) == 1.0
    assert not bool(new.aliens[4, 4])
    assert not bool(new.f_bullets[4, 4])  # bullet consumed


def test_space_invaders_enemy_bullet_kills():
    env = SpaceInvaders(sticky_prob=0.0)
    state, _ = env.reset(jax.random.key(0))
    eb = state.e_bullets.at[8, int(state.pos)].set(True)
    state = state._replace(e_bullets=eb)
    _, res = env.step(state, jnp.asarray(0))
    assert bool(res.terminated)


def test_freeway_score_resets_player():
    env = Freeway(sticky_prob=0.0)
    state, _ = env.reset(jax.random.key(0))
    # one step from the top, off cooldown; move all cars away from our column
    state = state._replace(
        player_y=jnp.asarray(1, jnp.int32),
        move_cooldown=jnp.zeros((), jnp.int32),
        car_x=jnp.zeros((8,), jnp.int32),
    )
    new, res = env.step(state, jnp.asarray(1))  # up
    assert float(res.reward) == 1.0
    assert int(new.player_y) == 9  # reset to start
    assert not bool(res.terminated)  # freeway only truncates


def test_freeway_collision_knocks_back():
    env = Freeway(sticky_prob=0.0)
    state, _ = env.reset(jax.random.key(0))
    # park a stopped car on the player's cell in lane 4
    car_x = state.car_x.at[3].set(4)  # lane index 3 -> row 4
    state = state._replace(
        player_y=jnp.asarray(4, jnp.int32),
        car_x=car_x,
        car_timer=jnp.full((8,), 100, jnp.int32),  # cars won't move
    )
    new, res = env.step(state, jnp.asarray(0))
    assert int(new.player_y) == 9
    assert float(res.reward) == 0.0


def test_asterix_gold_and_enemy():
    env = Asterix(sticky_prob=0.0)
    state, _ = env.reset(jax.random.key(0))
    # gold entity sitting where the player will stay (lane row 5 = slot 4)
    exists = state.ent_exists.at[4].set(True)
    ent_x = state.ent_x.at[4].set(5)
    gold = state.ent_gold.at[4].set(True)
    state = state._replace(
        ent_exists=exists, ent_x=ent_x, ent_gold=gold,
        move_timer=jnp.asarray(100, jnp.int32),  # entities won't move
        spawn_timer=jnp.asarray(100, jnp.int32),
    )
    new, res = env.step(state, jnp.asarray(0))
    assert float(res.reward) == 1.0
    assert not bool(res.terminated)
    assert not bool(new.ent_exists[4])  # collected
    # same but an enemy: terminal
    state = state._replace(ent_gold=state.ent_gold.at[4].set(False))
    _, res = env.step(state, jnp.asarray(0))
    assert bool(res.terminated)
    assert float(res.reward) == 0.0


@pytest.mark.parametrize("name", ["breakout", "asterix"])
def test_vectorized_autoreset(name):
    """MinAtar envs compose with the vmap auto-reset VectorEnv."""
    venv = VectorEnv(make_minatar(name), num_envs=4)
    state, _ = venv.reset(jax.random.key(0))
    step = jax.jit(venv.step)
    for i in range(30):
        acts = jax.random.randint(jax.random.key(i), (4,), 0, 3)
        state, res, carry_obs = step(state, acts, jax.random.key(1000 + i))
    assert res.obs.shape == (4, *venv.env.observation_space.shape)
    assert carry_obs.shape == res.obs.shape
    assert jnp.isfinite(res.obs).all()


def test_minatar_cnn_shapes():
    net = MinAtarCNN()
    x = jnp.zeros((8, 10, 10, 4))
    params = net.init(jax.random.key(0), x)
    out = net.apply(params, x)
    assert out.shape == (8, 128)
    assert out.dtype == jnp.float32


def test_nature_cnn_shapes_and_framestack_fold():
    net = NatureCNN(hidden=64)
    x = jnp.zeros((2, 84, 84, 4))
    params = net.init(jax.random.key(0), x)
    assert net.apply(params, x).shape == (2, 64)
    # frame-stacked [B,S,H,W,C] input folds the stack into channels
    xs = jnp.zeros((2, 4, 84, 84, 1))
    ps = net.init(jax.random.key(0), xs)
    assert net.apply(ps, xs).shape == (2, 64)


def test_conv_q_heads():
    x = jnp.zeros((8, 10, 10, 4))
    q = ConvQNet(num_actions=3)
    params = q.init(jax.random.key(0), x)
    assert q.apply(params, x).shape == (8, 3)
    dq = ConvDuelingQNet(num_actions=3)
    dparams = dq.init(jax.random.key(0), x)
    out = dq.apply(dparams, x)
    assert out.shape == (8, 3)
    # dueling identifiability: advantages are mean-centered, so for a
    # single state the Q-values minus their mean equal the advantage head
    assert jnp.isfinite(out).all()


# -- Seaquest dynamics (5th MinAtar game, VERDICT r4 item 7) -----------------


def _sq():
    return Seaquest(sticky_prob=0.0)


def _sq_state(env, **overrides):
    state, _ = env.reset(jax.random.key(0))
    return state._replace(**{k: jnp.asarray(v) for k, v in overrides.items()})


def test_seaquest_shapes_and_movement():
    env = _sq()
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (10, 10, 9)
    # dive, then move right: facing flips to +1 and x advances
    state, _ = env.step(state, jnp.asarray(4))  # down
    assert int(state.sub_y) == 1
    x0 = int(state.sub_x)
    state, _ = env.step(state, jnp.asarray(3))  # right
    assert int(state.sub_x) == x0 + 1 and int(state.sub_or) == 1
    state, _ = env.step(state, jnp.asarray(1))  # left
    assert int(state.sub_x) == x0 and int(state.sub_or) == -1


def test_seaquest_bullet_kills_fish_scores():
    env = _sq()
    st = _sq_state(
        env,
        sub_y=3, sub_x=2, sub_or=1, surfaced=False,
        # a fish 3 cells to the right in the same lane, not moving soon
        en_exists=jnp.zeros(8, bool).at[0].set(True),
        en_x=jnp.zeros(8, jnp.int32).at[0].set(6),
        en_y=jnp.ones(8, jnp.int32) * 3,
        en_dir=jnp.zeros(8, jnp.int32),  # static for the test
        en_move_timer=jnp.asarray(100, jnp.int32),
        en_spawn_timer=jnp.asarray(100, jnp.int32),
        dv_spawn_timer=jnp.asarray(100, jnp.int32),
    )
    st, res = env.step(st, jnp.asarray(5))  # fire -> bullet at (3,2) moves right
    total = float(res.reward)
    for _ in range(5):
        st, res = env.step(st, jnp.asarray(0))
        total += float(res.reward)
        if res.terminated:
            break
    assert total == 1.0  # fish at x=6 destroyed by the travelling bullet
    assert not bool(st.en_exists[0])


def test_seaquest_oxygen_depletes_and_kills():
    env = Seaquest(sticky_prob=0.0)
    st = _sq_state(env, sub_y=5, surfaced=False, oxygen=2,
                   en_spawn_timer=jnp.asarray(10_000, jnp.int32))
    st, res = env.step(st, jnp.asarray(0))
    assert not bool(res.terminated)
    st, res = env.step(st, jnp.asarray(0))
    st, res2 = env.step(st, jnp.asarray(0))
    assert bool(res2.terminated)  # oxygen < 0


def test_seaquest_surface_no_divers_terminal():
    env = _sq()
    st = _sq_state(env, sub_y=1, surfaced=False, diver_count=0)
    st, res = env.step(st, jnp.asarray(2))  # up to the surface with no divers
    assert bool(res.terminated)


def test_seaquest_surface_with_divers_drops_one_and_refills():
    env = _sq()
    st = _sq_state(env, sub_y=1, surfaced=False, diver_count=3, oxygen=17)
    st, res = env.step(st, jnp.asarray(2))
    assert not bool(res.terminated)
    assert int(st.diver_count) == 2
    assert int(st.oxygen) == env.MAX_OXYGEN
    assert float(res.reward) == 0.0


def test_seaquest_surface_with_six_divers_banks_reward_and_ramps():
    env = _sq()
    st = _sq_state(env, sub_y=1, surfaced=False, diver_count=6,
                   oxygen=env.MAX_OXYGEN)
    interval0 = int(st.en_spawn_interval)
    st, res = env.step(st, jnp.asarray(2))
    assert float(res.reward) >= 9.0  # oxygen*10//200 with near-full oxygen
    assert int(st.diver_count) == 0
    assert int(st.en_spawn_interval) == interval0 - 1


def test_seaquest_diver_collection():
    env = _sq()
    st = _sq_state(
        env,
        sub_y=4, sub_x=5, surfaced=False,
        dv_exists=jnp.zeros(4, bool).at[0].set(True),
        dv_x=jnp.zeros(4, jnp.int32).at[0].set(4),
        dv_y=jnp.ones(4, jnp.int32) * 4,
        dv_dir=jnp.zeros(4, jnp.int32),
        dv_move_timer=jnp.asarray(100, jnp.int32),
        en_spawn_timer=jnp.asarray(100, jnp.int32),
        dv_spawn_timer=jnp.asarray(100, jnp.int32),
    )
    st, res = env.step(st, jnp.asarray(1))  # move left onto the diver
    assert int(st.diver_count) == 1
    assert not bool(st.dv_exists[0])


def test_seaquest_enemy_contact_terminal():
    env = _sq()
    st = _sq_state(
        env,
        sub_y=4, sub_x=5, surfaced=False,
        en_exists=jnp.zeros(8, bool).at[0].set(True),
        en_x=jnp.zeros(8, jnp.int32).at[0].set(4),
        en_y=jnp.ones(8, jnp.int32) * 4,
        en_dir=jnp.zeros(8, jnp.int32),
        en_move_timer=jnp.asarray(100, jnp.int32),
    )
    st, res = env.step(st, jnp.asarray(1))  # step into the fish
    assert bool(res.terminated)
