"""Guards for bench.py's stages: the driver runs bench.py once per round
on the real chip, so each stage's pipeline must always CONSTRUCT and the
FLOPs accounting must stay sane.  These run the same code paths tiny on
the CPU mesh."""

import numpy as np


def test_synthetic_pixel_env_contract():
    """Deterministic frames, uint8, truncation at episode_len, auto-reset
    via VectorEnv."""
    import jax
    import jax.numpy as jnp

    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.synthetic import SyntheticPixelEnv

    env = SyntheticPixelEnv(32, 32, 2, num_actions=4, episode_len=5)
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (32, 32, 2) and obs.dtype == jnp.uint8
    # determinism: same state -> same frame
    s2, r = env.step(state, jnp.zeros((), jnp.int32))
    s2b, rb = env.step(state, jnp.zeros((), jnp.int32))
    np.testing.assert_array_equal(np.asarray(r.obs), np.asarray(rb.obs))
    venv = VectorEnv(env, 3)
    vstate, vobs = venv.reset(jax.random.key(1))
    for t in range(5):
        vstate, res, carry = venv.step(
            vstate, jnp.zeros(3, jnp.int32), jax.random.key(10 + t)
        )
    assert bool(res.truncated.all()) and not bool(res.terminated.any())
    # fresh episodes in the carry: t reset to 0
    assert int(vstate.t.max()) == 0


def test_bench_pipeline_builds_and_times_on_cpu():
    """bench.py's _bench_pipeline (AOT path) end to end at toy scale:
    returns sane steps/s and a compiled object with cost analysis."""
    import bench
    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.common import QNet

    env = CartPole()
    algo = DQN(
        network=QNet(hidden_sizes=(16,), num_actions=2),
        action_space=env.action_space,
        lr=1e-3, gamma=0.9, n_step=3, target_update_freq=100,
    )
    sps, dt, compiled, args = bench._bench_pipeline(
        algo, env, num_envs=8, segment_len=4, batch_size=16,
        updates_per_segment=2, n_iters=2,
    )
    assert sps > 0 and dt > 0
    assert bench._program_flops(compiled) >= 0  # cost analysis reachable


def test_pipeline_flops_trip_count_correction():
    """_pipeline_flops must exceed the scan-bodies-once figure by roughly
    the update trip count for a conv workload (the round-2 MFU bug was
    trusting cost analysis on scanned programs)."""
    import jax
    import jax.numpy as jnp

    import bench
    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.envs.synthetic import SyntheticPixelEnv
    from tianshou_tpu.networks.conv import ConvQNet

    env = SyntheticPixelEnv(32, 32, 2, num_actions=4)
    algo = DQN(
        network=ConvQNet(num_actions=4, encoder="minatar"),
        action_space=env.action_space,
        lr=1e-3, gamma=0.99, n_step=1, target_update_freq=100,
    )
    obs = jnp.zeros((1, 32, 32, 2), jnp.uint8)
    params = algo.network.init(jax.random.key(0), obs)
    f1 = bench._forward_flops(algo.network, params, obs)
    f8 = bench._forward_flops(
        algo.network, params, jnp.zeros((8, 32, 32, 2), jnp.uint8)
    )
    assert f8 > 4 * f1  # batched forward scales with batch
    total = bench._pipeline_flops(
        algo, (32, 32, 2), jnp.uint8, params,
        num_envs=8, seg=4, batch=8, updates=10,
    )
    # 10 updates x 4 fwd-equivalents x f8 + 4 rollout forwards
    expected = 10 * 4.0 * f8 + 4 * f8
    np.testing.assert_allclose(total, expected, rtol=1e-6)


def test_conv_layout_dispatch():
    """_to_hwc: channel-first grayscale stacks [B,S,H,W] and channels-last
    [B,H,W,C] produce consistent layouts; stacked 5-D folds into
    channels."""
    import jax.numpy as jnp

    from tianshou_tpu.networks.conv import _to_hwc

    x = jnp.arange(2 * 4 * 84 * 84).reshape(2, 4, 84, 84)
    out = _to_hwc(x)
    assert out.shape == (2, 84, 84, 4)
    np.testing.assert_array_equal(
        np.asarray(out), np.moveaxis(np.asarray(x), 1, -1)
    )
    y = jnp.zeros((2, 10, 10, 4))  # channels-last stays put
    assert _to_hwc(y).shape == (2, 10, 10, 4)
    z = jnp.zeros((2, 4, 84, 84, 1))  # stacked 5-D -> folded channels
    assert _to_hwc(z).shape == (2, 84, 84, 4)
