"""Trainer-hook edge cases on a deterministic corridor env: warmup
accounting, train_param_fn scheduling, save_best_fn invocation,
test_in_train early stop, and logger interval gating (reference
``trainer/base.py`` hook semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algos.dqn import DQN
from tianshou_tpu.collect.collector import Collector
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.envs.base import VectorEnv
from tianshou_tpu.envs.spaces import Discrete
from tianshou_tpu.networks.common import QNet
from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer
from tianshou_tpu.utils.logger import BaseLogger
from tests.helpers import MoveToRight


class RecordingLogger(BaseLogger):
    def __init__(self, **kw):
        super().__init__(**kw)
        self.writes: list[tuple[int, dict]] = []
        self.saves: list[tuple[int, int, int]] = []

    def write(self, step, data):
        self.writes.append((step, dict(data)))

    def save_data(self, epoch, env_step, gradient_step, save_checkpoint_fn=None):
        self.saves.append((epoch, env_step, gradient_step))
        super().save_data(epoch, env_step, gradient_step, save_checkpoint_fn)


def _trainer(**overrides):
    env = MoveToRight(size=3, max_t=20)
    algo = DQN(
        network=QNet((32, 32), 2),
        action_space=Discrete(2),
        lr=1e-3,
        gamma=0.9,
        n_step=1,
        target_update_freq=50,
    )
    buffer = ReplayBuffer(capacity=512, num_envs=4)
    kw = dict(
        max_epoch=2,
        step_per_epoch=512,
        step_per_collect=32,
        update_per_step=0.25,
        batch_size=32,
        episode_per_test=4,
        warmup_steps=64,
        seed=0,
    )
    kw.update(overrides)
    return OffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 4), buffer),
        Collector(algo, VectorEnv(env, 4)),
        buffer,
        **kw,
    )


def test_warmup_steps_counted_and_hooks_fire():
    schedule_calls = []
    best_states = []
    tr = _trainer(
        train_param_fn=lambda epoch, step: schedule_calls.append((epoch, step))
        or max(0.05, 0.5 - step / 1000),
        save_best_fn=lambda ts: best_states.append(ts),
    )
    info = tr.run()
    # warmup steps are included in env_step accounting
    assert info.env_step >= 2 * 512 + 64
    # the schedule saw monotonically growing env steps starting past warmup
    steps = [s for _, s in schedule_calls]
    assert steps[0] >= 64
    assert steps == sorted(steps)
    # corridor reward reaches 1.0 -> at least one best-model save
    assert best_states
    assert info.best_reward > 0


def test_test_in_train_early_stop():
    tr = _trainer(
        max_epoch=8,
        stop_fn=lambda rew: rew >= 0.99,
        test_in_train=True,
    )
    info = tr.run()
    assert info.stop_triggered
    # stopped before exhausting the full budget
    assert info.epoch <= 8
    assert info.best_reward >= 0.99


def test_logger_interval_gating_and_counter_saves():
    lg = RecordingLogger(train_interval=128)
    tr = _trainer(logger=lg)
    tr.run()
    # per-epoch counter saves (2 epochs)
    assert len(lg.saves) == 2
    assert lg.saves[0][0] == 1 and lg.saves[1][0] == 2
    # train writes gated to >= 128-step spacing
    train_steps = [s for s, d in lg.writes if any(k.startswith("train/") for k in d)]
    assert train_steps, "train data must be logged"
    assert all(b - a >= 128 for a, b in zip(train_steps, train_steps[1:]))
    # test writes happen every epoch (interval 1)
    test_steps = [s for s, d in lg.writes if any(k.startswith("test/") for k in d)]
    assert len(test_steps) >= 2


def test_update_count_matches_ratio():
    tr = _trainer(update_per_step=0.25, max_epoch=1)
    info = tr.run()
    # 512 steps/epoch at 0.25 updates/step = 128 gradient steps (+rounding)
    assert abs(info.gradient_step - 128) <= 8


def test_second_run_starts_fresh():
    """run() twice on one trainer must not leak smoothing/metric state
    (ADVICE round-1 item)."""
    tr = _trainer(max_epoch=1)
    info1 = tr.run()
    info2 = tr.run()
    assert info2.env_step == info1.env_step


def test_default_train_param_is_algo_exploration_noise():
    """Regression: with no train_param_fn, the off-policy trainers default
    the explore param to the ALGORITHM's own exploration noise — a bare
    0.0 silently disabled Gaussian exploration for deterministic actors
    (TD3 HalfCheetah plateaued at half the reference return)."""
    import jax

    from tianshou_tpu.algos.ddpg import TD3
    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole, Pendulum
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.networks.continuous import CriticEnsemble, DeterministicActor
    from tianshou_tpu.trainer.distributed import DistributedOffPolicyTrainer
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    env = Pendulum()
    td3 = TD3(
        DeterministicActor((16,), 1),
        CriticEnsemble((16,), num_critics=2),
        env.action_space,
        exploration_noise=0.25,
    )
    buf = ReplayBuffer(capacity=16, num_envs=2)

    def mk(trainer_cls):
        return trainer_cls(
            td3, Collector(td3, VectorEnv(env, 2), buf),
            Collector(td3, VectorEnv(env, 2)), buf,
            max_epoch=1, step_per_epoch=4, step_per_collect=2,
        )

    assert mk(OffPolicyTrainer).train_param_fn(1, 0) == 0.25
    assert mk(DistributedOffPolicyTrainer).train_param_fn(1, 0) == 0.25
    # explicit schedules still win
    t = OffPolicyTrainer(
        td3, Collector(td3, VectorEnv(env, 2), buf),
        Collector(td3, VectorEnv(env, 2)), buf,
        max_epoch=1, step_per_epoch=4, step_per_collect=2,
        train_param_fn=lambda e, s: 0.05,
    )
    assert t.train_param_fn(1, 0) == 0.05
    # eps-greedy algos without exploration_noise keep the 0.0 default
    denv = CartPole()
    dqn = DQN(network=QNet((16,), 2), action_space=denv.action_space)
    dbuf = ReplayBuffer(capacity=16, num_envs=2)
    t2 = OffPolicyTrainer(
        dqn, Collector(dqn, VectorEnv(denv, 2), dbuf),
        Collector(dqn, VectorEnv(denv, 2)), dbuf,
        max_epoch=1, step_per_epoch=4, step_per_collect=2,
    )
    assert t2.train_param_fn(1, 0) == 0.0
