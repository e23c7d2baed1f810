"""Tests for loggers, statistics utilities, obs-norm env, noise, and REDQ
(the reference's ``test_utils.py`` / ``test_logger.py`` analogs)."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.envs.classic import Pendulum
from tianshou_tpu.envs.norm import NormObsVectorEnv
from tianshou_tpu.exploration.noise import GaussianNoise, OUNoise
from tianshou_tpu.utils.logger import (
    DataScope,
    LazyLogger,
    TensorboardLogger,
)
from tianshou_tpu.utils.statistics import (
    MovAvg,
    RunningMeanStd,
    rms_init,
    rms_normalize,
    rms_update,
)


def test_movavg():
    m = MovAvg(size=3)
    m.add(1.0)
    m.add([2.0, 3.0])
    assert m.get() == 2.0
    m.add(np.inf)  # filtered
    assert m.get() == 2.0
    m.add(4.0)  # window slides: [2, 3, 4]
    assert m.get() == 3.0


def test_running_mean_std_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.normal(3.0, 2.0, size=(1000, 4))
    rms = RunningMeanStd()
    for chunk in np.split(data, 10):
        rms.update(chunk)
    np.testing.assert_allclose(rms.mean, data.mean(0), atol=1e-6)
    np.testing.assert_allclose(rms.var, data.var(0), atol=1e-6)


def test_device_rms_matches_numpy():
    rng = np.random.default_rng(1)
    data = rng.normal(-1.0, 0.5, size=(256, 3)).astype(np.float32)
    st = rms_init((3,))
    for chunk in np.split(data, 4):
        st = rms_update(st, jnp.asarray(chunk))
    np.testing.assert_allclose(np.asarray(st.mean), data.mean(0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(st.var), data.var(0), atol=1e-3)
    normed = rms_normalize(st, jnp.asarray(data))
    assert abs(float(normed.mean())) < 0.1


def test_norm_obs_env_standardizes():
    venv = NormObsVectorEnv(Pendulum(), num_envs=8, update_rms=True)
    state, obs = venv.reset(jax.random.key(0))
    all_obs = [np.asarray(obs)]
    for i in range(50):
        act = jnp.zeros((8, 1))
        state, res, carry = venv.step(state, act, jax.random.key(i))
        all_obs.append(np.asarray(res.obs))
    stacked = np.concatenate(all_obs)
    # normalized obs roughly standardized
    assert np.all(np.abs(stacked.mean(0)) < 1.0)
    assert np.all(stacked.std(0) < 3.0)
    # rms transfer helpers
    rms = NormObsVectorEnv.get_rms(state)
    state2 = NormObsVectorEnv.with_rms(state, rms)
    assert state2[1] is rms


def test_tensorboard_logger_roundtrip(tmp_path):
    logger = TensorboardLogger(str(tmp_path), train_interval=1)
    logger.log_train_data({"returns_mean": 1.5, "nested": {"x": 2.0}}, 10)
    logger.save_data(3, 1000, 50)
    logger.finalize()
    logger2 = TensorboardLogger(str(tmp_path))
    epoch, env_step, grad_step = logger2.restore_data()
    assert (epoch, env_step, grad_step) == (3, 1000, 50)
    data = logger2.restore_logged_data()
    assert "train/returns_mean" in data
    assert data["train/returns_mean"][0] == (10, 1.5)
    assert "train/nested/x" in data


def test_lazy_logger_and_intervals():
    logger = LazyLogger()
    logger.log_train_data({"x": 1}, 0)  # no-op, must not raise
    from tianshou_tpu.utils.logger import BaseLogger

    writes = []

    class Rec(BaseLogger):
        def write(self, step, data):
            writes.append(step)

    r = Rec(train_interval=100)
    r.log_train_data({"x": 1}, 0)  # 0 - (-1) < 100: skipped
    r.log_train_data({"x": 1}, 120)  # 121 >= 100: written
    r.log_train_data({"x": 1}, 150)  # 30 < 100: skipped
    r.log_train_data({"x": 1}, 240)
    assert writes == [120, 240]


def test_noise_processes():
    g = GaussianNoise(sigma=2.0)
    st = g.init_state((4,))
    st, n = g.sample(st, jax.random.key(0), (1000,))
    assert 1.5 < float(jnp.std(n)) < 2.5
    ou = OUNoise(sigma=0.3, theta=0.15)
    st = ou.init_state((4,))
    vals = []
    for i in range(100):
        st, n = ou.sample(st, jax.random.key(i))
        vals.append(np.asarray(n))
    # mean-reverting around 0, temporally correlated
    arr = np.stack(vals)
    assert abs(arr.mean()) < 0.5
    corr = np.corrcoef(arr[:-1, 0], arr[1:, 0])[0, 1]
    assert corr > 0.5


def test_redq_pendulum():
    from tianshou_tpu.algos.redq import REDQ
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.networks.continuous import CriticEnsemble, GaussianActor
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    env = Pendulum()
    algo = REDQ(
        actor=GaussianActor((128, 128), 1, conditioned_sigma=True),
        critic=CriticEnsemble((128, 128), num_critics=10),
        action_space=env.action_space,
        ensemble_size=10,
        subset_size=2,
        actor_delay=20,
        auto_alpha=True,
    )
    buffer = ReplayBuffer(capacity=2000, num_envs=10)
    trainer = OffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 10), buffer),
        Collector(algo, VectorEnv(env, 10)),
        buffer,
        max_epoch=8,
        step_per_epoch=6000,
        step_per_collect=100,
        update_per_step=0.25,
        batch_size=256,
        stop_fn=lambda rew: rew >= -250,
        warmup_steps=1000,
        seed=0,
    )
    info = trainer.run()
    assert info.stop_triggered, f"best={info.best_reward}"


def test_her_ddpg_goal_reach():
    """Sparse-reward goal task solvable with HER (the analog of the
    reference's HER tests over MyGoalEnv)."""
    from tests.helpers import GoalReachEnv
    from tianshou_tpu.algos.ddpg import DDPG
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.her import HERReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.networks.continuous import CriticEnsemble, DeterministicActor
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    env = GoalReachEnv()
    algo = DDPG(
        actor=DeterministicActor((128, 128), 1),
        critic=CriticEnsemble((128, 128), num_critics=1),
        action_space=env.action_space,
        gamma=0.95,
        exploration_noise=0.25,
    )
    buffer = HERReplayBuffer(
        capacity=4000,
        num_envs=10,
        compute_reward_fn=GoalReachEnv.compute_reward,
        achieved_slice=(1, 2),
        desired_slice=(2, 3),
        horizon=16,
        future_k=8.0,
    )
    trainer = OffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 10), buffer),
        Collector(algo, VectorEnv(env, 10)),
        buffer,
        max_epoch=6,
        step_per_epoch=5000,
        step_per_collect=100,
        update_per_step=0.125,
        batch_size=256,
        stop_fn=lambda rew: rew >= -9,
        warmup_steps=2000,
        seed=0,
    )
    info = trainer.run()
    assert info.stop_triggered, f"best={info.best_reward}"


def test_icm_dqn_cartpole():
    """ICM-wrapped DQN still solves CartPole (wrapper correctness; the
    reference wraps any policy the same way, icm.py:36)."""
    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.algos.icm import ICM, ICMNet
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    env = CartPole()
    inner = DQN(
        network=QNet((128, 128), 2),
        action_space=env.action_space,
        gamma=0.95,
        n_step=1,
        target_update_freq=320,
    )
    algo = ICM(
        inner,
        ICMNet((64,), feature_dim=32, num_actions=2),
        lr=1e-3,
        reward_scale=0.01,
    )
    buffer = ReplayBuffer(capacity=2000, num_envs=10)
    trainer = OffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 10), buffer),
        Collector(algo, VectorEnv(env, 10)),
        buffer,
        max_epoch=5,
        step_per_epoch=10000,
        step_per_collect=100,
        update_per_step=0.1,
        batch_size=64,
        train_param_fn=lambda e, s: 0.1,
        stop_fn=lambda rew: rew >= 180,
        warmup_steps=1000,
        seed=0,
    )
    info = trainer.run()
    assert info.stop_triggered, f"best={info.best_reward}"
    assert "icm_loss" in info.last_metrics


def test_psrl_nchain():
    """PSRL discovers the forward policy on NChain (the reference's
    tabular PSRL test pattern)."""
    from tianshou_tpu.algos.psrl import PSRL
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import NChain
    from tianshou_tpu.trainer.onpolicy import OnPolicyTrainer

    env = NChain()
    algo = PSRL(num_states=5, action_space=env.action_space, gamma=0.95)
    trainer = OnPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 8)),
        Collector(algo, VectorEnv(env, 8)),
        max_epoch=5,
        step_per_epoch=2000,
        step_per_collect=400,
        repeat_per_collect=1,
        batch_size=400,
        episode_per_test=8,
        stop_fn=lambda rew: rew >= 300,
        seed=0,
    )
    info = trainer.run()
    assert info.stop_triggered, f"best={info.best_reward}"


def test_trainer_checkpoint_and_resume(tmp_path):
    """Per-epoch checkpoint hook + counter resume through the tensorboard
    logger (reference resume_from_log semantics)."""
    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer
    from tianshou_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    env = CartPole()
    saved = []

    def make_trainer(resume):
        algo = DQN(QNet((32,), 2), env.action_space, target_update_freq=50)
        buffer = ReplayBuffer(capacity=200, num_envs=4)
        return algo, OffPolicyTrainer(
            algo,
            Collector(algo, VectorEnv(env, 4), buffer),
            Collector(algo, VectorEnv(env, 4)),
            buffer,
            max_epoch=2,
            step_per_epoch=200,
            step_per_collect=40,
            update_per_step=0.1,
            batch_size=32,
            episode_per_test=2,
            warmup_steps=50,
            seed=0,
            logger=TensorboardLogger(str(tmp_path)),
            save_checkpoint_fn=lambda e, s, g: saved.append((e, s, g)),
            resume_from_log=resume,
        )

    algo, trainer = make_trainer(resume=False)
    info = trainer.run()
    assert len(saved) == 2  # one checkpoint per epoch
    assert saved[-1][0] == 2

    # orbax round-trip of the full training state
    path = save_checkpoint(str(tmp_path / "state"), trainer.train_state)
    restored = restore_checkpoint(path, trainer.train_state)
    assert int(restored.step) == int(trainer.train_state.step)

    # resume: counters restored from the event log, epochs continue
    algo2, trainer2 = make_trainer(resume=True)
    trainer2.max_epoch = 3
    info2 = trainer2.run()
    assert info2.epoch == 3
    assert info2.env_step > info.env_step  # continued past the restored count


def test_test_in_train_early_stop():
    """Opportunistic in-training testing stops as soon as train returns
    clear the bar and the test phase confirms (trainer/base.py:469-510)."""
    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    env = CartPole()
    algo = DQN(
        QNet((128, 128, 128), 2), env.action_space, gamma=0.9, n_step=3,
        target_update_freq=320,
    )
    buffer = ReplayBuffer(capacity=2000, num_envs=10)
    trainer = OffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 10), buffer),
        Collector(algo, VectorEnv(env, 10)),
        buffer,
        max_epoch=5,
        step_per_epoch=50000,  # huge epoch: only test_in_train can stop it
        step_per_collect=100,
        update_per_step=0.1,
        batch_size=64,
        train_param_fn=lambda e, s: 0.1,
        stop_fn=lambda rew: rew >= 150,
        warmup_steps=1000,
        seed=0,
        test_in_train=True,
    )
    info = trainer.run()
    assert info.stop_triggered
    assert info.best_reward >= 150
    assert info.env_step < 50000  # stopped inside the first epoch


def test_tree_packer_roundtrip_exact():
    """TreePacker: fixed-schema pytrees round-trip exactly through the one
    flat float32 buffer (bools, int32 < 2**24, float32; float64 canonical-
    izes to float32 like a direct device_put would)."""
    import jax
    import jax.numpy as jnp

    from tianshou_tpu.data.batch import Batch
    from tianshou_tpu.utils.transfer import TreePacker

    rng = np.random.default_rng(0)
    example = Batch(
        obs=rng.normal(size=(4, 3)).astype(np.float32),
        act=rng.integers(0, 5, (4,)).astype(np.int32),
        done=rng.integers(0, 2, (4,)).astype(bool),
        f64=rng.normal(size=(2,)),  # float64 -> float32 canonicalization
    )
    p = TreePacker(example)
    flat = p.pack(example)
    assert flat.dtype == np.float32 and flat.shape == (4 * 3 + 4 + 4 + 2,)
    out = jax.jit(p.unpack)(jnp.asarray(flat))
    np.testing.assert_array_equal(np.asarray(out["obs"]), example["obs"])
    np.testing.assert_array_equal(np.asarray(out["act"]), example["act"])
    np.testing.assert_array_equal(np.asarray(out["done"]), example["done"])
    assert np.asarray(out["act"]).dtype == np.int32
    assert np.asarray(out["done"]).dtype == bool
    np.testing.assert_allclose(
        np.asarray(out["f64"]), example["f64"].astype(np.float32), rtol=0
    )
    # a second pack with different values reuses the schema
    ex2 = jax.tree.map(lambda x: np.zeros_like(x), example)
    np.testing.assert_array_equal(p.pack(ex2), np.zeros_like(flat))


def test_tree_packer_int_edge_values():
    """int32 values near the float32-exactness bound survive; the docstring
    contract (< 2**24 exact) holds at the boundary."""
    from tianshou_tpu.data.batch import Batch
    from tianshou_tpu.utils.transfer import TreePacker

    vals = np.asarray([0, 1, 2**20, 2**24 - 1, -(2**24 - 1)], np.int32)
    ex = Batch(v=vals)
    p = TreePacker(ex)
    out = p.unpack(p.pack(ex))
    np.testing.assert_array_equal(np.asarray(out["v"]), vals)


# -- AOT executable cache (utils/aot_cache.py) -------------------------------


def test_aot_cache_roundtrip(tmp_path, monkeypatch, request):
    """serialize_executable-backed store: hit returns a runnable executable
    with identical outputs; corrupt entries self-heal to a miss."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tianshou_tpu.utils import aot_cache

    monkeypatch.setenv("TIANSHOU_TPU_AOT_CACHE", str(tmp_path))
    # compile_uncached quarantines jax_compilation_cache_dir for process
    # lifetime BY DESIGN (async backend cache writes); restore it after
    # this test so later tests keep the warm persistent cache
    prev_cache_dir = jax.config.jax_compilation_cache_dir
    request.addfinalizer(
        lambda: jax.config.update("jax_compilation_cache_dir", prev_cache_dir)
    )

    def f(x, y):
        return jnp.tanh(x @ y).sum(axis=1), x + 1.0

    # pin to ONE device: under the 8-device virtual CPU mesh the
    # deserialized executable otherwise reloads expecting 8 shards
    dev = jax.devices()[0]
    sds = jax.sharding.SingleDeviceSharding(dev)
    x = jax.device_put(jnp.arange(12.0).reshape(3, 4), dev)
    y = jax.device_put(jnp.ones((4, 5)), dev)
    lowered = jax.jit(f, in_shardings=(sds, sds), out_shardings=(sds, sds)).lower(x, y)
    key = aot_cache.aot_cache_key(lowered, extra="test")
    assert aot_cache.load_compiled(key) is None  # cold miss
    compiled = aot_cache.compile_uncached(lowered)
    o1 = compiled(x, y)
    assert aot_cache.store_compiled(key, compiled)
    c2 = aot_cache.load_compiled(key)
    assert c2 is not None
    o2 = c2(x, y)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]))
    # key depends on the program: a different function misses
    lowered_b = jax.jit(
        lambda x, y: (x @ y, x), in_shardings=(sds, sds)
    ).lower(x, y)
    assert aot_cache.aot_cache_key(lowered_b, extra="test") != key
    # corrupt the entry -> load self-heals to a miss and removes the file
    path = tmp_path / (key + ".pkl")
    path.write_bytes(b"garbage")
    assert aot_cache.load_compiled(key) is None
    assert not path.exists()
