"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The analog of the reference's single-machine 'distribution' testing strategy
(SURVEY.md §4.7): the full fused training super-step is jitted over a
``jax.sharding.Mesh`` with the env/batch axis sharded (data parallelism) and
must (a) compile + execute, and (b) produce the same numbers as the
unsharded program — XLA inserts the collectives; semantics must not change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.algos.dqn import DQN
from tianshou_tpu.algos.sac import SAC
from tianshou_tpu.collect.collector import Collector
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.envs.base import VectorEnv
from tianshou_tpu.envs.classic import CartPole, Pendulum
from tianshou_tpu.networks.common import QNet
from tianshou_tpu.networks.continuous import CriticEnsemble, GaussianActor
from tianshou_tpu.parallel.mesh import make_mesh, replicate, shard_leading_axis
from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer


def _setup(algo, env, num_envs, capacity=64):
    venv = VectorEnv(env, num_envs)
    buffer = ReplayBuffer(capacity=capacity, num_envs=num_envs)
    collector = Collector(algo, venv, buffer)
    trainer = OffPolicyTrainer(
        algo, collector, collector, buffer,
        max_epoch=1, step_per_epoch=1,
        step_per_collect=num_envs * 4, update_per_step=0.25,
        batch_size=num_envs,
    )
    cstate = collector.reset(jax.random.key(0))
    ts = algo.init(jax.random.key(1), jax.tree.map(lambda x: x[0], cstate.obs))
    bstate = buffer.init(collector.example_transition(ts, cstate))
    return trainer, collector, cstate, ts, bstate


def test_dqn_superstep_sharded_matches_unsharded():
    assert len(jax.devices()) >= 8
    env = CartPole()
    algo = DQN(
        QNet((32, 32), 2), env.action_space, n_step=3, target_update_freq=10
    )
    trainer, collector, cstate, ts, bstate = _setup(algo, env, num_envs=16)
    superstep = trainer._build_superstep()

    # the superstep donates its buffer argument: shard a copy up front
    mesh = make_mesh(8)
    cstate_s = shard_leading_axis(cstate, mesh)
    bstate_s = shard_leading_axis(bstate, mesh)
    ts_s = replicate(ts, mesh)

    # unsharded reference result
    ts1, _, _, out1, m1 = superstep(ts, cstate, bstate, jax.random.key(2), 0.1)
    superstep2 = trainer._build_superstep()
    ts2, _, _, out2, m2 = superstep2(
        ts_s, cstate_s, bstate_s, jax.random.key(2), 0.1
    )

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out1["done"]), np.asarray(out2["done"])
    )
    # parameters evolve identically
    for a, b in zip(
        jax.tree_util.tree_leaves(ts1.params), jax.tree_util.tree_leaves(ts2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sac_superstep_compiles_sharded():
    env = Pendulum()
    algo = SAC(
        actor=GaussianActor((32, 32), 1, conditioned_sigma=True),
        critic=CriticEnsemble((32, 32), num_critics=2),
        action_space=env.action_space,
    )
    trainer, collector, cstate, ts, bstate = _setup(algo, env, num_envs=8)
    mesh = make_mesh(8)
    cstate = shard_leading_axis(cstate, mesh)
    bstate = shard_leading_axis(bstate, mesh)
    ts = replicate(ts, mesh)
    superstep = trainer._build_superstep()
    ts, cstate, bstate, outputs, metrics = superstep(
        ts, cstate, bstate, jax.random.key(3), 0.0
    )
    assert np.isfinite(float(metrics["critic_loss"]))


def test_sharded_training_improves():
    """A short sharded DQN training run actually learns (the collectives
    carry gradients correctly)."""
    env = CartPole()
    algo = DQN(
        QNet((64, 64), 2), env.action_space, gamma=0.9, n_step=3,
        target_update_freq=100,
    )
    num_envs = 8
    venv = VectorEnv(env, num_envs)
    buffer = ReplayBuffer(capacity=500, num_envs=num_envs)
    collector = Collector(algo, venv, buffer)
    trainer = OffPolicyTrainer(
        algo, collector, Collector(algo, VectorEnv(env, 8)), buffer,
        max_epoch=3, step_per_epoch=6000, step_per_collect=80,
        update_per_step=0.125, batch_size=64,
        train_param_fn=lambda e, s: 0.1,
        stop_fn=lambda r: r >= 150, warmup_steps=500, seed=0,
    )
    mesh = make_mesh(8)
    # shard the initial states; jit keeps the sharding through the run
    cstate = collector.reset(jax.random.key(1))
    ts = algo.init(jax.random.key(2), jax.tree.map(lambda x: x[0], cstate.obs))
    bstate = buffer.init(collector.example_transition(ts, cstate))
    cstate = shard_leading_axis(cstate, mesh)
    bstate = shard_leading_axis(bstate, mesh)
    ts = replicate(ts, mesh)
    superstep = trainer._build_superstep()
    key = jax.random.key(3)
    for i in range(150):
        key, k = jax.random.split(key)
        ts, cstate, bstate, outputs, metrics = superstep(ts, cstate, bstate, k, 0.1)
    stats = trainer.test_collector.collect_episodes(ts, jax.random.key(9), 10)
    assert stats.returns_mean >= 120, f"mean={stats.returns_mean}"


def test_dryrun_multichip_two_axis_mesh():
    """The driver-facing dryrun executes end to end on the 8-device CPU
    mesh, including the dp x ep phase (env axis data-parallel + SAC
    critic ensemble sharded over the second mesh axis)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_ensemble_sharded_update_matches_replicated():
    """Ensemble parallelism is a pure layout change: one SAC update with
    critic [K,...] leaves sharded over 'ep' must produce numerically
    identical parameters to the fully replicated run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tianshou_tpu.algos.sac import SAC
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import Pendulum
    from tianshou_tpu.networks.continuous import CriticEnsemble, GaussianActor
    from tianshou_tpu.parallel.mesh import (
        make_mesh2,
        replicate,
        shard_ensemble_axis,
        shard_leading_axis,
    )

    env = Pendulum()
    sac = SAC(
        actor=GaussianActor((16, 16), 1, conditioned_sigma=True),
        critic=CriticEnsemble((16, 16), num_critics=2),
        action_space=env.action_space,
    )
    buffer = ReplayBuffer(capacity=32, num_envs=8)
    col = Collector(sac, VectorEnv(env, 8), buffer)
    cstate = col.reset(jax.random.key(0))
    ts0 = sac.init(jax.random.key(1), jax.tree.map(lambda x: x[0], cstate.obs))
    bstate = buffer.init(col.example_transition(ts0, cstate))
    cstate, bstate, _, _ = col.collect(ts0, cstate, bstate, 8)

    def one_update(ts, bst):
        ts, _, metrics = sac.update(ts, buffer, bst, jax.random.key(7), 16)
        return ts, metrics

    # replicated baseline
    ts_a, m_a = jax.jit(one_update)(ts0, bstate)
    # ensemble-sharded run
    mesh = make_mesh2(8, second_size=2)
    ts_s = replicate(ts0, mesh)
    ts_s = ts_s.replace(
        critic_params=shard_ensemble_axis(ts_s.critic_params, mesh, 2),
        target_critic_params=shard_ensemble_axis(
            ts_s.target_critic_params, mesh, 2
        ),
        critic_opt_state=shard_ensemble_axis(ts_s.critic_opt_state, mesh, 2),
    )
    bst_s = shard_leading_axis(bstate, mesh)
    ts_b, m_b = jax.jit(one_update)(ts_s, bst_s)

    np.testing.assert_allclose(
        float(m_a["critic_loss"]), float(m_b["critic_loss"]), rtol=1e-5
    )
    for la, lb in zip(
        jax.tree_util.tree_leaves(ts_a.critic_params),
        jax.tree_util.tree_leaves(ts_b.critic_params),
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=2e-5, atol=1e-6
        )
