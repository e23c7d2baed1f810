"""Fused fine-grained host cycle (OffPolicyTrainer._build_fused_cycle).

The fused path reproduces the reference's 1-update-per-env-step regime
(``mujoco_sac.py`` defaults: ``training_num=1, step_per_collect=1``) with one
device dispatch per collect/update cycle.  These tests pin (a) exact buffer
contents — the transition the env produced is the transition the device ring
stores, with the policy's raw action — and (b) end-to-end learning through
the fused path.
"""

import gymnasium as gym
import jax
import numpy as np

from tianshou_tpu.algos.ddpg import DDPG
from tianshou_tpu.algos.dqn import DQN
from tianshou_tpu.algos.sac import SAC
from tianshou_tpu.collect.host_collector import HostCollector
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.envs.host import HostVectorEnv, space_from_gym
from tianshou_tpu.envs.spaces import Discrete
from tianshou_tpu.networks.common import QNet
from tianshou_tpu.networks.continuous import (
    CriticEnsemble,
    DeterministicActor,
    GaussianActor,
)
from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer


class _RecordingVenv(HostVectorEnv):
    """Records every (obs_fed_to_step, step result) pair."""

    def __init__(self, env_fns):
        super().__init__(env_fns)
        self.records = []

    def step(self, actions):
        res, carry = super().step(actions)
        self.records.append((np.asarray(actions).copy(), res))
        return res, carry


def test_fused_cycle_buffer_contents_match_env():
    make = lambda: gym.make("Pendulum-v1")
    n_envs, cap = 2, 32
    train_venv = _RecordingVenv([make for _ in range(n_envs)])
    test_venv = HostVectorEnv([make for _ in range(n_envs)])
    act_space = space_from_gym(train_venv.action_space)
    algo = DDPG(
        DeterministicActor((16,), 1),
        CriticEnsemble((16,), num_critics=1),
        act_space,
    )
    buffer = ReplayBuffer(capacity=cap, num_envs=n_envs)
    trainer = OffPolicyTrainer(
        algo,
        HostCollector(algo, train_venv, buffer),
        HostCollector(algo, test_venv),
        buffer,
        max_epoch=1,
        step_per_epoch=5 * n_envs,  # 5 fused cycles
        step_per_collect=n_envs,  # segment_len == 1 -> fused applies
        update_per_step=1.0,
        batch_size=4,
        episode_per_test=1,
        warmup_steps=0,
        seed=0,
    )
    info = trainer.run()
    assert trainer.last_run_used_fused
    # records[0] is the schema-probe step (non-fused col.collect(1), not
    # stored — same as the segmented host path); the fused engine's 5
    # recorded cycles follow and land in buffer rows 0..4.
    assert info.env_step == 5 * n_envs
    storage = jax.tree.map(np.asarray, trainer.buffer_state.storage)
    size = np.asarray(trainer.buffer_state.size)
    assert (size == 5).all()
    for row, (act, res) in enumerate(train_venv.records[1:6]):
        np.testing.assert_allclose(
            storage["rew"][:, row], res.reward, rtol=1e-6
        )
        np.testing.assert_allclose(
            storage["obs_next"][:, row], np.asarray(res.obs, np.float32),
            rtol=1e-5,
        )
        np.testing.assert_array_equal(
            storage["terminated"][:, row], res.terminated
        )
        np.testing.assert_array_equal(
            storage["truncated"][:, row], res.truncated
        )
        # stored act is the RAW policy-space action; env act = map_action:
        # for Pendulum low=-2, high=2 -> env = 2 * raw
        np.testing.assert_allclose(
            np.asarray(algo.map_action(storage["act"][:, row])).reshape(-1),
            act.reshape(-1),
            rtol=1e-5,
        )
    # chaining: obs of row r+1 equals carry of row r when not done
    for row in range(4):
        _, res = train_venv.records[1 + row]
        done = res.terminated | res.truncated
        for e in range(n_envs):
            if not done[e]:
                np.testing.assert_allclose(
                    storage["obs"][e, row + 1],
                    storage["obs_next"][e, row],
                    rtol=1e-6,
                )
    train_venv.close()
    test_venv.close()


def test_fused_cycle_deterministic_across_runs():
    """Same seed -> bit-identical stored transitions: pins the fused
    cycle's counter-based key derivation (fold_in(base_key, ctr)) so a
    refactor can't silently change the exploration stream."""
    def run_once():
        make = lambda: gym.make("Pendulum-v1")
        venv = HostVectorEnv([make for _ in range(2)])
        test_venv = HostVectorEnv([make for _ in range(2)])
        act_space = space_from_gym(venv.action_space)
        algo = DDPG(
            DeterministicActor((16,), 1),
            CriticEnsemble((16,), num_critics=1),
            act_space,
        )
        buffer = ReplayBuffer(capacity=32, num_envs=2)
        trainer = OffPolicyTrainer(
            algo,
            HostCollector(algo, venv, buffer),
            HostCollector(algo, test_venv),
            buffer,
            max_epoch=1,
            step_per_epoch=12,
            step_per_collect=2,
            batch_size=4,
            episode_per_test=1,
            warmup_steps=0,
            seed=7,
        )
        trainer.run()
        assert trainer.last_run_used_fused
        out = jax.tree.map(np.asarray, trainer.buffer_state.storage)
        venv.close()
        test_venv.close()
        return out

    a, b = run_once(), run_once()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_fused_cycle_dqn_cartpole_learns():
    make = lambda: gym.make("CartPole-v1")
    algo = DQN(
        network=QNet((128, 128, 128), 2),
        action_space=Discrete(2),
        gamma=0.9,
        n_step=3,
        target_update_freq=320,
    )
    buffer = ReplayBuffer(capacity=2000, num_envs=8)
    train_venv = HostVectorEnv([make for _ in range(8)])
    test_venv = HostVectorEnv([make for _ in range(8)])
    trainer = OffPolicyTrainer(
        algo,
        HostCollector(algo, train_venv, buffer),
        HostCollector(algo, test_venv),
        buffer,
        max_epoch=4,
        step_per_epoch=10000,
        step_per_collect=8,  # fused: 1 step/env per cycle
        update_per_step=0.125,  # 1 update per 8-step cycle
        batch_size=64,
        train_param_fn=lambda e, s: 0.1,
        stop_fn=lambda rew: rew >= 195,
        warmup_steps=1000,
        seed=0,
    )
    info = trainer.run()
    train_venv.close()
    test_venv.close()
    assert trainer.last_run_used_fused
    assert info.stop_triggered, f"best={info.best_reward}"


def test_fused_cycle_sac_pendulum_learns():
    make = lambda: gym.make("Pendulum-v1")
    n = 4
    train_venv = HostVectorEnv([make for _ in range(n)])
    test_venv = HostVectorEnv([make for _ in range(n)])
    act_space = space_from_gym(train_venv.action_space)
    algo = SAC(
        actor=GaussianActor((64, 64), 1, conditioned_sigma=True),
        critic=CriticEnsemble((64, 64), num_critics=2),
        action_space=act_space,
        auto_alpha=True,
    )
    buffer = ReplayBuffer(capacity=5000, num_envs=n)
    trainer = OffPolicyTrainer(
        algo,
        HostCollector(algo, train_venv, buffer),
        HostCollector(algo, test_venv),
        buffer,
        max_epoch=10,
        step_per_epoch=2000,
        step_per_collect=n,
        update_per_step=1.0,
        batch_size=128,
        episode_per_test=4,
        stop_fn=lambda rew: rew >= -250,
        warmup_steps=1000,
        seed=2,
    )
    info = trainer.run()
    train_venv.close()
    test_venv.close()
    assert trainer.last_run_used_fused
    assert info.stop_triggered, f"best={info.best_reward}"


def _count_transfers_for(num_cycles: int) -> tuple[int, int]:
    """Run `num_cycles` fused cycles; return (device_put calls, jitted
    dispatches) observed during the whole trainer run."""
    make = lambda: gym.make("Pendulum-v1")
    n_envs = 2
    train_venv = HostVectorEnv([make for _ in range(n_envs)])
    test_venv = HostVectorEnv([make for _ in range(n_envs)])
    act_space = space_from_gym(train_venv.action_space)
    algo = DDPG(
        DeterministicActor((16,), 1),
        CriticEnsemble((16,), num_critics=1),
        act_space,
    )
    buffer = ReplayBuffer(capacity=64, num_envs=n_envs)
    trainer = OffPolicyTrainer(
        algo,
        HostCollector(algo, train_venv, buffer),
        HostCollector(algo, test_venv),
        buffer,
        max_epoch=1,
        step_per_epoch=num_cycles * n_envs,
        step_per_collect=n_envs,
        update_per_step=1.0,
        batch_size=4,
        episode_per_test=1,
        warmup_steps=0,
        seed=0,
    )
    puts = dispatches = 0
    real_put = jax.device_put
    real_jit = jax.jit

    def counting_put(*a, **k):
        nonlocal puts
        puts += 1
        return real_put(*a, **k)

    def counting_jit(fn, *a, **k):
        jitted = real_jit(fn, *a, **k)

        def wrapped(*ca, **ck):
            nonlocal dispatches
            dispatches += 1
            return jitted(*ca, **ck)

        wrapped.lower = jitted.lower  # AOT path passthrough
        return wrapped

    jax.device_put = counting_put
    jax.jit = counting_jit
    try:
        trainer.run()
    finally:
        jax.device_put = real_put
        jax.jit = real_jit
    assert trainer.last_run_used_fused
    train_venv.close()
    test_venv.close()
    return puts, dispatches


def test_fused_cycle_single_transfer_per_cycle():
    """Perf regression guard (round-4 Walker2d lesson): the fused fine cycle
    must stay ONE host->device feed and ONE jitted program dispatch per
    collect/update cycle — the 3-round-trip segmented shape (param sync +
    trajectory upload + separate update dispatch) must not silently creep
    back in.  Measured differentially so setup-time transfers cancel."""
    p5, d5 = _count_transfers_for(5)
    p12, d12 = _count_transfers_for(12)
    extra_cycles = 12 - 5
    assert p12 - p5 == extra_cycles, (
        f"{(p12 - p5) / extra_cycles:.1f} device_put per cycle (want 1)"
    )
    assert d12 - d5 == extra_cycles, (
        f"{(d12 - d5) / extra_cycles:.1f} dispatches per cycle (want 1)"
    )
