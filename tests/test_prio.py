"""PER tests: sum tree vs naive reference (the reference's
``test_buffer.py:523-604`` pattern), proportional sampling, IS weights,
priority write-back, and a PER-DQN smoke train."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.prio import PrioritizedReplayBuffer
from tianshou_tpu.ops.segtree import (
    segtree_init,
    segtree_sample,
    segtree_total,
    segtree_update,
)
from tests.test_buffer import _example, _tr


def test_segtree_matches_naive():
    rng = np.random.default_rng(0)
    cap = 48  # non-power-of-2: padded internally
    naive = np.zeros(64)
    tree = segtree_init(cap)
    for _ in range(10):
        idx = rng.integers(0, cap, size=7)
        vals = rng.random(7)
        # naive last-write-wins for duplicates
        for i, v in zip(idx, vals):
            naive[i] = v
        # dedupe for exactness (scatter order for duplicates is unspecified)
        uniq, last = np.unique(idx[::-1], return_index=True)
        idx_u = uniq
        vals_u = vals[::-1][last]
        tree = segtree_update(tree, jnp.asarray(idx_u), jnp.asarray(vals_u))
        for i, v in zip(idx_u, vals_u):
            naive[i] = v
        assert np.isclose(float(segtree_total(tree)), naive.sum(), rtol=1e-5)

    # inverse-CDF: each u lands in the right bucket
    prefix = np.cumsum(naive)
    for u in rng.random(20) * naive.sum():
        got = int(segtree_sample(tree, jnp.asarray([u]))[0])
        expected = int(np.searchsorted(prefix, u, side="right"))
        assert got == expected


def test_segtree_sampling_proportional():
    tree = segtree_init(8)
    probs = jnp.asarray([1.0, 0.0, 3.0, 0.0, 0.0, 0.0, 0.0, 4.0])
    tree = segtree_update(tree, jnp.arange(8), probs)
    u = jax.random.uniform(jax.random.key(0), (4000,)) * segtree_total(tree)
    idx = np.asarray(segtree_sample(tree, u))
    counts = np.bincount(idx, minlength=8) / 4000
    np.testing.assert_allclose(counts[[0, 2, 7]], [1 / 8, 3 / 8, 4 / 8], atol=0.03)
    assert counts[[1, 3, 4, 5, 6]].sum() == 0


def test_prio_buffer_sampling_and_writeback():
    buf = PrioritizedReplayBuffer(capacity=16, num_envs=2, alpha=1.0, beta=0.5)
    st = buf.init(_example())
    for i in range(8):
        st = buf.add(st, _tr(i, num_envs=2).to_jax())
    env_idx, pos, w = buf.sample_with_weights(st, jax.random.key(0), 128)
    # only valid slots sampled
    assert np.asarray(pos).max() < 8
    assert np.allclose(np.asarray(w), 1.0)  # all priorities equal -> weight 1

    # boost priority of (env 0, pos 3) and verify dominance
    st = buf.update_priorities(
        st,
        jnp.zeros(1, jnp.int32),
        jnp.full(1, 3, jnp.int32),
        jnp.asarray([100.0]),
    )
    env_idx, pos, w = buf.sample_with_weights(st, jax.random.key(1), 512)
    frac = np.mean((np.asarray(env_idx) == 0) & (np.asarray(pos) == 3))
    assert frac > 0.8
    # the dominant sample has max weight 1; rare ones have larger raw
    # weight before normalization -> after normalization dominant < rare
    rare = (np.asarray(env_idx) != 0) | (np.asarray(pos) != 3)
    if rare.any():
        assert np.asarray(w)[rare].max() >= np.asarray(w)[~rare].max()


def test_per_weight_oracle_parity():
    """IS-weight values pinned against a numpy re-implementation of the
    reference semantics (``tianshou/data/buffer/prio.py:44-104``): leaves
    hold ``prio**alpha``, ``_min_prio`` is the running min of RAW
    priorities, ``get_weight = (leaf / _min_prio)^-beta``, and
    ``weight_norm`` divides by the batch max."""
    alpha, beta = 0.6, 0.4
    rng = np.random.default_rng(3)

    for weight_norm in (True, False):
        buf = PrioritizedReplayBuffer(
            capacity=16, num_envs=1, alpha=alpha, beta=beta,
            weight_norm=weight_norm,
        )
        st = buf.init(_example())
        # numpy oracle state
        leaves = np.zeros(16)
        max_prio = min_prio = 1.0
        n = 12
        for i in range(n):
            st = buf.add(st, _tr(i, num_envs=1).to_jax())
            leaves[i] = max_prio**alpha
        # several rounds of TD write-back with random priorities
        for _ in range(4):
            # unique indices: scatter order for duplicates is unspecified
            idx = rng.permutation(n)[:5]
            td = rng.random(5) * 3.0
            st = buf.update_priorities(
                st,
                jnp.zeros(5, jnp.int32),
                jnp.asarray(idx, jnp.int32),
                jnp.asarray(td),
            )
            prio = np.abs(td) + 1e-6
            # last-write-wins for duplicate indices (both sides scatter)
            for j, p in zip(idx, prio):
                leaves[j] = p**alpha
            max_prio = max(max_prio, prio.max())
            min_prio = min(min_prio, prio.min())

        env_idx, pos, w = buf.sample_with_weights(st, jax.random.key(7), 64)
        pos_np = np.asarray(pos)
        expected = (leaves[pos_np] / min_prio) ** (-beta)
        if weight_norm:
            expected = expected / expected.max()
        np.testing.assert_allclose(np.asarray(w), expected, rtol=1e-4)


def test_per_dqn_smoke():
    """PER-DQN runs end-to-end inside jit and improves."""
    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    env = CartPole()
    algo = DQN(
        network=QNet((64, 64), 2),
        action_space=env.action_space,
        gamma=0.9,
        n_step=3,
        target_update_freq=100,
    )
    buffer = PrioritizedReplayBuffer(capacity=1000, num_envs=8, alpha=0.6, beta=0.4)
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
        seed=0,
    )
    info = trainer.run()
    assert info.best_reward >= 150, f"best={info.best_reward}"
