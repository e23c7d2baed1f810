"""Offline trainer: gradient steps from a static buffer, no collection.

TPU-native counterpart of the reference ``OfflineTrainer``
(``tianshou/trainer/base.py:586-605``): each epoch is ``update_per_epoch``
jitted update steps (fused into scanned super-steps), followed by test
episodes; ``env_step`` accounting follows the reference
(``gradient_step * batch_size``, ``trainer/base.py:333-336``).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

import jax
import numpy as np

from tianshou_tpu.algos.base import Algorithm, TrainState
from tianshou_tpu.collect.collector import Collector
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.data.stats import InfoStats

__all__ = ["OfflineTrainer"]


class OfflineTrainer:
    def __init__(
        self,
        algo: Algorithm,
        buffer: ReplayBuffer,
        buffer_state: ReplayBufferState,
        test_collector: Collector,
        *,
        max_epoch: int,
        update_per_epoch: int,
        batch_size: int = 256,
        episode_per_test: int = 10,
        updates_per_superstep: int = 100,
        stop_fn: Callable[[float], bool] | None = None,
        logger: Any | None = None,
        seed: int = 0,
        save_best_fn: Callable[[TrainState], None] | None = None,
    ):
        self.algo = algo
        self.buffer = buffer
        self.buffer_state = buffer_state
        self.test_collector = test_collector
        self.max_epoch = max_epoch
        self.update_per_epoch = update_per_epoch
        self.batch_size = batch_size
        self.episode_per_test = episode_per_test
        self.updates_per_superstep = min(updates_per_superstep, update_per_epoch)
        self.stop_fn = stop_fn
        self.logger = logger
        self.seed = seed
        self.save_best_fn = save_best_fn

    def _build_superstep(self):
        from tianshou_tpu.trainer.offpolicy import build_update_scan

        return jax.jit(
            build_update_scan(
                self.algo, self.buffer, self.batch_size,
                self.updates_per_superstep,
            )
        )

    def run(self) -> InfoStats:
        t0 = time.time()
        key = jax.random.key(self.seed)
        k_init, key = jax.random.split(key)
        # derive obs example from the buffer storage
        obs_example = jax.tree.map(
            lambda x: x[0, 0], self.buffer_state.storage["obs"]
        )
        ts = self.algo.init(k_init, obs_example)
        bstate = self.buffer_state
        # one-time dataset preprocessing (e.g. CalQL calibration returns —
        # the reference's process_buffer hook, cql.py:214-233)
        if hasattr(self.algo, "prepare_offline"):
            bstate = self.algo.prepare_offline(self.buffer, bstate)
        # AOT compile (persistent-cache-deterministic; see OffPolicyTrainer)
        jitted = self._build_superstep()
        compiled = jitted.lower(ts, bstate, jax.random.key(0)).compile()
        superstep = lambda *a: compiled(*a)

        grad_step = 0
        best_reward, best_reward_std = -np.inf, 0.0
        last_metrics: dict = {}
        stop_triggered = False
        epoch = 0
        for epoch in range(1, self.max_epoch + 1):
            done_updates = 0
            while done_updates < self.update_per_epoch:
                key, k_u = jax.random.split(key)
                ts, bstate, metrics = superstep(ts, bstate, k_u)
                done_updates += self.updates_per_superstep
                grad_step += self.updates_per_superstep
                last_metrics = {k: float(v) for k, v in metrics.items()}
            if self.logger is not None:
                self.logger.log_update_data(last_metrics, grad_step)
            key, k_t = jax.random.split(key)
            test_stats = self.test_collector.collect_episodes(
                ts, k_t, self.episode_per_test, explore=False
            )
            rew, rew_std = test_stats.returns_mean, test_stats.returns_std
            if rew > best_reward:
                best_reward, best_reward_std = rew, rew_std
                if self.save_best_fn is not None:
                    self.save_best_fn(ts)
            if self.logger is not None:
                self.logger.log_test_data(
                    {"returns_mean": rew, "returns_std": rew_std}, grad_step
                )
            if self.stop_fn is not None and self.stop_fn(rew):
                stop_triggered = True
                break

        self.train_state = ts
        return InfoStats(
            gradient_step=grad_step,
            env_step=grad_step * self.batch_size,
            epoch=epoch,
            best_reward=float(best_reward),
            best_reward_std=float(best_reward_std),
            duration=time.time() - t0,
            stop_triggered=stop_triggered,
            last_metrics=last_metrics,
        )
