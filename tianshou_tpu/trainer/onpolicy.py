"""On-policy trainer: fused (rollout -> process -> repeat x minibatch SGD).

TPU-native counterpart of the reference ``OnpolicyTrainer``
(``tianshou/trainer/base.py:647-694``): instead of writing the rollout into a
replay buffer, passing the whole buffer to ``learn`` and then resetting it
(``trainer/base.py:689``), the collect scan emits the trajectory directly as
stacked ``[T, N, ...]`` arrays; advantage computation and the
repeat x shuffled-minibatch SGD loops run in the same jitted super-step.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algos.base import Algorithm, TrainState
from tianshou_tpu.collect.collector import Collector, rollout_segment
from tianshou_tpu.data.stats import InfoStats
from tianshou_tpu.data.tree import tree_slice
from tianshou_tpu.trainer.hooks import MetricSmoother, RunContext

__all__ = ["OnPolicyTrainer"]


class OnPolicyTrainer:
    def __init__(
        self,
        algo: Algorithm,
        train_collector: Collector,
        test_collector: Collector,
        *,
        max_epoch: int,
        step_per_epoch: int,
        step_per_collect: int,
        repeat_per_collect: int = 1,
        batch_size: int = 64,
        episode_per_test: int = 10,
        stop_fn: Callable[[float], bool] | None = None,
        logger: Any | None = None,
        seed: int = 0,
        save_best_fn: Callable[[TrainState], None] | None = None,
        save_checkpoint_fn: Callable[[int, int, int], None] | None = None,
        resume_from_log: bool = False,
        test_in_train: bool = False,
        show_progress: bool = False,
        profile_dir: str | None = None,
        smooth_window: int = 1,
    ):
        self.algo = algo
        self.train_collector = train_collector
        self.test_collector = test_collector
        self.max_epoch = max_epoch
        self.step_per_epoch = step_per_epoch
        self.repeat_per_collect = repeat_per_collect
        self.batch_size = batch_size
        self.episode_per_test = episode_per_test
        self.stop_fn = stop_fn
        self.logger = logger
        self.seed = seed
        self.save_best_fn = save_best_fn
        self.save_checkpoint_fn = save_checkpoint_fn
        self.resume_from_log = resume_from_log
        self.test_in_train = test_in_train
        self.show_progress = show_progress
        self.profile_dir = profile_dir
        self.smooth_window = smooth_window

        num_envs = train_collector.venv.num_envs
        self.segment_len = max(1, step_per_collect // num_envs)
        self.steps_per_segment = self.segment_len * num_envs
        self._superstep = None

    # ------------------------------------------------------------------
    def _build_superstep(self):
        algo = self.algo
        seg = rollout_segment(
            algo,
            self.train_collector.venv,
            None,
            self.segment_len,
            explore=True,
            record_traj=True,
        )
        M = self.steps_per_segment
        bs = min(self.batch_size, M)
        nmb = max(1, M // bs)
        repeat = self.repeat_per_collect
        recompute = getattr(algo, "recompute_advantage", False)

        has_pre_learn = hasattr(algo, "pre_learn")

        def superstep(ts, cstate, key):
            cstate, _, outputs = seg(ts, cstate, None, 0.0)
            traj = outputs["traj"]
            pre_metrics = {}
            if has_pre_learn:
                key, k_pre = jax.random.split(key)
                ts, pre_metrics = algo.pre_learn(ts, traj, k_pre)
            processed0 = algo.process_rollout(ts, traj)
            # fold this rollout into the running return statistics AFTER
            # the first processing pass (reference ret_rms.update order)
            ts = algo.update_rollout_stats(ts, traj)

            def repeat_body(carry, k):
                ts = carry
                processed = (
                    algo.process_rollout(ts, traj) if recompute else processed0
                )
                k_perm, k_learn = jax.random.split(k)
                perm = jax.random.permutation(k_perm, M)[: nmb * bs].reshape(
                    nmb, bs
                )

                def mb_body(ts, xs):
                    idx, i = xs
                    mb = tree_slice(processed, idx)
                    return algo.learn(ts, mb, jax.random.fold_in(k_learn, i))

                ts, metrics = jax.lax.scan(
                    mb_body, ts, (perm, jnp.arange(nmb))
                )
                return ts, jax.tree.map(lambda m: m.mean(), metrics)

            keys = jax.random.split(key, repeat)
            ts, metrics = jax.lax.scan(repeat_body, ts, keys)
            metrics = jax.tree.map(lambda m: m.mean(), metrics)
            metrics.update(pre_metrics)
            return ts, cstate, outputs, metrics

        return jax.jit(superstep)

    # ------------------------------------------------------------------
    def _build_learn_fn(self):
        """Jitted (process rollout -> repeat x minibatch SGD) for the
        host-env path (rollout arrives as numpy from the host collector)."""
        algo = self.algo
        M = self.steps_per_segment
        bs = min(self.batch_size, M)
        nmb = max(1, M // bs)
        repeat = self.repeat_per_collect
        recompute = getattr(algo, "recompute_advantage", False)
        has_pre_learn = hasattr(algo, "pre_learn")

        def learn(ts, traj, key):
            pre_metrics = {}
            if has_pre_learn:
                key, k_pre = jax.random.split(key)
                ts, pre_metrics = algo.pre_learn(ts, traj, k_pre)
            processed0 = algo.process_rollout(ts, traj)
            ts = algo.update_rollout_stats(ts, traj)

            def repeat_body(ts, k):
                processed = (
                    algo.process_rollout(ts, traj) if recompute else processed0
                )
                k_perm, k_learn = jax.random.split(k)
                perm = jax.random.permutation(k_perm, M)[: nmb * bs].reshape(
                    nmb, bs
                )

                def mb_body(ts, xs):
                    idx, i = xs
                    return algo.learn(
                        ts, tree_slice(processed, idx),
                        jax.random.fold_in(k_learn, i),
                    )

                ts, metrics = jax.lax.scan(
                    mb_body, ts, (perm, jnp.arange(nmb))
                )
                return ts, jax.tree.map(lambda m: m.mean(), metrics)

            keys = jax.random.split(key, repeat)
            ts, metrics = jax.lax.scan(repeat_body, ts, keys)
            metrics = jax.tree.map(lambda m: m.mean(), metrics)
            metrics.update(pre_metrics)
            return ts, metrics

        return jax.jit(learn)

    def _run_host(self) -> InfoStats:
        t_start = time.time()
        # fresh smoothing state per run (repeated run() calls must not
        # inherit the previous run's moving averages)
        self.smooth = MetricSmoother(self.smooth_window)
        key = jax.random.key(self.seed)
        k_init, key = jax.random.split(key)
        col = self.train_collector
        col.reset(seed=self.seed)
        ts = self.algo.init(k_init, jnp.asarray(col.obs[0]))
        learn_fn = self._build_learn_fn()

        env_step = 0
        grad_step = 0
        start_epoch = 0
        if self.resume_from_log and self.logger is not None:
            start_epoch, env_step, grad_step = self.logger.restore_data()
        best_reward, best_reward_std = -np.inf, 0.0
        last_metrics: dict = {}
        stop_triggered = False
        epoch = 0
        updates_per_segment = self.repeat_per_collect * max(
            1, self.steps_per_segment // min(self.batch_size, self.steps_per_segment)
        )
        with RunContext(
            (self.max_epoch - start_epoch) * self.step_per_epoch,
            self.show_progress, self.profile_dir, desc="onpolicy",
        ) as rc:
            for epoch in range(start_epoch + 1, self.max_epoch + 1):
                steps_this_epoch = 0
                while steps_this_epoch < self.step_per_epoch:
                    key, k_c, k_u = jax.random.split(key, 3)
                    _, stats, traj = col.collect(
                        ts, None, self.segment_len, k_c,
                        explore=True, record_traj=True,
                    )
                    # re-commit to the accelerator: leaves collected under
                    # act_on_host are CPU-committed and would otherwise
                    # drag the learn program onto the CPU backend
                    traj_dev = jax.device_put(traj.to_jax(), jax.devices()[0])
                    ts, metrics = learn_fn(ts, traj_dev, k_u)
                    env_step += self.steps_per_segment
                    steps_this_epoch += self.steps_per_segment
                    grad_step += updates_per_segment
                    last_metrics = self.smooth(
                        {k: float(v) for k, v in metrics.items()}
                    )
                    rc.step(self.steps_per_segment, last_metrics)
                    # opportunistic in-training test (trainer/base.py:469-510)
                    if (
                        self.test_in_train
                        and self.stop_fn is not None
                        and stats.returns.size
                        and self.stop_fn(stats.returns_mean)
                    ):
                        key, k_tt = jax.random.split(key)
                        tt = self.test_collector.collect_episodes(
                            ts, k_tt, self.episode_per_test, explore=False
                        )
                        if self.stop_fn(tt.returns_mean):
                            best_reward = max(best_reward, tt.returns_mean)
                            best_reward_std = tt.returns_std
                            stop_triggered = True
                            break
                    if self.logger is not None:
                        self.logger.log_train_data(
                            {
                                "env_step": env_step,
                                # only when the segment finished episodes:
                                # a constant 0.0 between episode ends makes
                                # the train-return curve unreadable
                                **(
                                    {"returns_mean": stats.returns_mean}
                                    if stats.returns.size
                                    else {}
                                ),
                                **last_metrics,
                            },
                            env_step,
                        )
                if stop_triggered:
                    break
                if self.logger is not None:
                    self.logger.save_data(
                        epoch, env_step, grad_step, self.save_checkpoint_fn
                    )
                elif self.save_checkpoint_fn is not None:
                    self.save_checkpoint_fn(epoch, env_step, grad_step)
                key, k_test = jax.random.split(key)
                test_stats = self.test_collector.collect_episodes(
                    ts, k_test, self.episode_per_test, explore=False
                )
                rew, rew_std = test_stats.returns_mean, test_stats.returns_std
                if rew > best_reward:
                    best_reward, best_reward_std = rew, rew_std
                    if self.save_best_fn is not None:
                        self.save_best_fn(ts)
                if self.logger is not None:
                    self.logger.log_test_data(
                        {"returns_mean": rew, "returns_std": rew_std}, env_step
                    )
                if self.stop_fn is not None and self.stop_fn(rew):
                    stop_triggered = True
                    break

        self.train_state = ts
        return InfoStats(
            gradient_step=grad_step,
            env_step=env_step,
            epoch=epoch,
            best_reward=float(best_reward),
            best_reward_std=float(best_reward_std),
            duration=time.time() - t_start,
            stop_triggered=stop_triggered,
            last_metrics=last_metrics,
        )

    def run(self) -> InfoStats:
        if getattr(self.train_collector, "is_host_collector", False):
            return self._run_host()
        t_start = time.time()
        self.smooth = MetricSmoother(self.smooth_window)
        key = jax.random.key(self.seed)
        k_init, k_reset, key = jax.random.split(key, 3)

        cstate = self.train_collector.reset(k_reset)
        ts = self.algo.init(k_init, jax.tree.map(lambda x: x[0], cstate.obs))

        if self._superstep is None:
            # AOT (lower -> compile) instead of jit dispatch: identical
            # executable, but the compile goes through the persistent
            # cache deterministically (the jit path has been observed to
            # stall minutes on conv-heavy programs via the tunneled chip)
            jitted = self._build_superstep()
            compiled = jitted.lower(ts, cstate, jax.random.key(0)).compile()
            self._superstep = lambda *a: compiled(*a)

        env_step = 0
        grad_step = 0
        start_epoch = 0
        if self.resume_from_log and self.logger is not None:
            start_epoch, env_step, grad_step = self.logger.restore_data()
        best_reward = -np.inf
        best_reward_std = 0.0
        last_metrics: dict = {}
        stop_triggered = False
        epoch = 0
        updates_per_segment = self.repeat_per_collect * max(
            1, self.steps_per_segment // min(self.batch_size, self.steps_per_segment)
        )

        with RunContext(
            (self.max_epoch - start_epoch) * self.step_per_epoch,
            self.show_progress, self.profile_dir, desc="onpolicy",
        ) as rc:
            for epoch in range(start_epoch + 1, self.max_epoch + 1):
                steps_this_epoch = 0
                while steps_this_epoch < self.step_per_epoch:
                    key, k_step = jax.random.split(key)
                    ts, cstate, outputs, metrics = self._superstep(
                        ts, cstate, k_step
                    )
                    env_step += self.steps_per_segment
                    steps_this_epoch += self.steps_per_segment
                    grad_step += updates_per_segment
                    stats = Collector.summarize(outputs, self.steps_per_segment)
                    last_metrics = self.smooth(
                        {k: float(v) for k, v in metrics.items()}
                    )
                    rc.step(self.steps_per_segment, last_metrics)
                    if (
                        self.test_in_train
                        and self.stop_fn is not None
                        and stats.returns.size
                        and self.stop_fn(stats.returns_mean)
                    ):
                        key, k_tt = jax.random.split(key)
                        tt = self.test_collector.collect_episodes(
                            ts, k_tt, self.episode_per_test, explore=False
                        )
                        if self.stop_fn(tt.returns_mean):
                            best_reward = max(best_reward, tt.returns_mean)
                            best_reward_std = tt.returns_std
                            stop_triggered = True
                            break
                    if self.logger is not None:
                        self.logger.log_train_data(
                            {
                                "env_step": env_step,
                                # only when the segment finished episodes:
                                # a constant 0.0 between episode ends makes
                                # the train-return curve unreadable
                                **(
                                    {"returns_mean": stats.returns_mean}
                                    if stats.returns.size
                                    else {}
                                ),
                                **last_metrics,
                            },
                            env_step,
                        )

                if stop_triggered:
                    break
                if self.logger is not None:
                    self.logger.save_data(
                        epoch, env_step, grad_step, self.save_checkpoint_fn
                    )
                elif self.save_checkpoint_fn is not None:
                    self.save_checkpoint_fn(epoch, env_step, grad_step)
                key, k_test = jax.random.split(key)
                test_stats = self.test_collector.collect_episodes(
                    ts, k_test, self.episode_per_test, explore=False
                )
                rew, rew_std = test_stats.returns_mean, test_stats.returns_std
                if rew > best_reward:
                    best_reward, best_reward_std = rew, rew_std
                    if self.save_best_fn is not None:
                        self.save_best_fn(ts)
                if self.logger is not None:
                    self.logger.log_test_data(
                        {"returns_mean": rew, "returns_std": rew_std}, env_step
                    )
                if self.stop_fn is not None and self.stop_fn(rew):
                    stop_triggered = True
                    break

        self.train_state = ts
        self.collect_state = cstate
        return InfoStats(
            gradient_step=grad_step,
            env_step=env_step,
            epoch=epoch,
            best_reward=float(best_reward),
            best_reward_std=float(best_reward_std),
            duration=time.time() - t_start,
            stop_triggered=stop_triggered,
            last_metrics=last_metrics,
        )
