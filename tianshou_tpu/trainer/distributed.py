"""Multi-process off-policy trainer: the STANDARD replay pipeline, scaled.

This is the distributed counterpart of :class:`OffPolicyTrainer` — not a
side path.  The reference's distribution story plugs Ray env workers into
the unchanged collector→buffer→update pipeline
(``tianshou/env/worker/ray.py:1-79`` inside the stack of SURVEY.md §3.1);
the TPU-native analog keeps the same invariant across pod hosts:

- every process steps its OWN env shard with the local jitted collector and
  writes into its OWN replay-buffer shard (HBM-local, never gathered);
- every gradient step, each process presamples ``batch/num_processes``
  transitions from its local shard — full n-step chains, PER
  importance-sampling weights, frame stacks, exactly as single-host — and
  the shards are assembled into one dp-sharded global batch
  (:func:`host_shard_pytree`);
- ONE ``update_sampled`` jitted over the global mesh consumes that batch;
  params are replicated, so XLA derives the gradient all-reduce over
  ICI and every process ends the step with identical parameters;
- PER priority write-back happens process-locally: |TD| under the
  pre-update params (the reference's ``post_process_fn`` semantics,
  ``policy/base.py:480-502``) via :meth:`Algorithm.priority_scores`.

Epochs, test episodes, early stopping and checkpointing run in lockstep:
the PRNG chain that drives update/test keys is identical on every process
(only env-reset and replay-sampling keys fold in the process index), so
every process reaches the same stop decision without a control-plane
broadcast.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

import jax
import numpy as np

from tianshou_tpu.algos.base import Algorithm, TrainState
from tianshou_tpu.collect.collector import Collector
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.data.prio import PrioritizedReplayBuffer
from tianshou_tpu.data.stats import InfoStats
from tianshou_tpu.parallel.distributed import global_mesh, host_shard_pytree

__all__ = ["DistributedOffPolicyTrainer", "DistributedOnPolicyTrainer"]


class DistributedOffPolicyTrainer:
    """SPMD off-policy training over ``jax.process_count()`` processes.

    ``train_collector``/``buffer`` are this process's LOCAL shard (the
    caller sizes them at ``total / process_count``, cf.
    :func:`process_env_slice`); ``batch_size`` and ``step_per_collect``
    are GLOBAL quantities, split evenly across processes.
    """

    def __init__(
        self,
        algo: Algorithm,
        train_collector: Collector,
        test_collector: Collector,
        buffer: ReplayBuffer,
        *,
        max_epoch: int,
        step_per_epoch: int,
        step_per_collect: int,
        update_per_step: float = 1.0,
        batch_size: int = 64,
        episode_per_test: int = 10,
        train_param_fn: Callable[[int, int], float] | None = None,
        test_param: float = 0.0,
        stop_fn: Callable[[float], bool] | None = None,
        warmup_steps: int = 0,
        warmup_random: bool = True,
        logger: Any | None = None,
        seed: int = 0,
        mesh=None,
        axis_name: str = "dp",
    ):
        self.algo = algo
        self.train_collector = train_collector
        self.test_collector = test_collector
        self.buffer = buffer
        self.max_epoch = max_epoch
        self.step_per_epoch = step_per_epoch
        self.step_per_collect = step_per_collect
        self.update_per_step = update_per_step
        self.batch_size = batch_size
        self.episode_per_test = episode_per_test
        # same default as OffPolicyTrainer: the algorithm's own
        # exploration noise unless a schedule is given
        if train_param_fn is None:
            default_param = float(getattr(algo, "exploration_noise", 0.0))
            train_param_fn = lambda epoch, step: default_param
        self.train_param_fn = train_param_fn
        self.test_param = test_param
        self.stop_fn = stop_fn
        self.warmup_steps = warmup_steps
        self.warmup_random = warmup_random
        self.logger = logger
        self.seed = seed
        self.mesh = mesh
        self.axis_name = axis_name

        assert getattr(algo, "supports_presampled", False), (
            "DistributedOffPolicyTrainer needs the presample/update_sampled "
            "split (algo.supports_presampled)"
        )

    def _build_global_update(self, mesh, example_transition):
        """``(ts, sampled_global, key) -> (ts, metrics)`` jitted over the
        global mesh.  The buffer handed to ``update_sampled`` is a dummy
        uniform ring: inside the global step its only role is PER
        write-back, which is process-local here (see class docstring)."""
        algo = self.algo
        dummy_buf = ReplayBuffer(capacity=1, num_envs=1)
        dummy_bstate = dummy_buf.init(example_transition)
        from jax.sharding import NamedSharding, PartitionSpec as P

        dummy_bstate = jax.device_put(dummy_bstate, NamedSharding(mesh, P()))

        def step(ts, sampled, bstate, key):
            ts, _, metrics = algo.update_sampled(
                ts, dummy_buf, bstate, sampled, key
            )
            return ts, metrics

        jitted = jax.jit(step)
        return lambda ts, sampled, key: jitted(ts, sampled, dummy_bstate, key)

    def run(self) -> InfoStats:
        t_start = time.time()
        n_proc = jax.process_count()
        pid = jax.process_index()
        mesh = self.mesh if self.mesh is not None else global_mesh(self.axis_name)
        col = self.train_collector
        local_envs = col.venv.num_envs
        global_envs = local_envs * n_proc
        segment_len = max(1, self.step_per_collect // global_envs)
        steps_per_segment = segment_len * global_envs
        updates_per_segment = max(
            1, round(self.update_per_step * steps_per_segment)
        )
        batch_local = max(1, self.batch_size // n_proc)
        is_per = isinstance(self.buffer, PrioritizedReplayBuffer)

        # identical algo seed everywhere -> replicated init params; env
        # seeds fold in the process id -> disjoint experience shards
        key = jax.random.key(self.seed)
        k_init, k_reset, key = jax.random.split(key, 3)
        cstate = col.reset(jax.random.fold_in(k_reset, pid))
        ts = self.algo.init(k_init, jax.tree.map(lambda x: x[0], cstate.obs))
        example = col.example_transition(ts, cstate)
        bstate = self.buffer.init(example)
        global_update = self._build_global_update(mesh, example)

        env_step = 0
        grad_step = 0
        best_reward, best_reward_std = -np.inf, 0.0
        last_metrics: dict = {}
        # PER write-back path, jitted once (an eager recompute would
        # dispatch the whole target forward op by op per gradient step).
        # Algorithms whose fractions/samples are generated PER GLOBAL ROW
        # (IQN's rowwise taus) take a row_offset so the local shard's
        # recompute regenerates exactly the rows it occupied inside the
        # global batch.
        prio_fn = None
        prio_takes_offset = False
        if is_per:
            import inspect

            # catch the base-class implementation (returns None) up front:
            # without this, an unsupported algorithm would die much later
            # with an opaque TypeError inside update_priorities
            if inspect.unwrap(
                type(self.algo).priority_scores
            ) is inspect.unwrap(Algorithm.priority_scores):
                raise TypeError(
                    f"{type(self.algo).__name__} does not implement "
                    "priority_scores(), which distributed PER requires for "
                    "process-local priority write-back; use a uniform "
                    "ReplayBuffer or implement priority_scores on the "
                    "algorithm (see algos/base.py)."
                )
            prio_takes_offset = (
                "row_offset"
                in inspect.signature(self.algo.priority_scores).parameters
            )
            prio_fn = jax.jit(self.algo.priority_scores)

        if self.warmup_steps > 0:
            warm_len = max(1, self.warmup_steps // global_envs)
            cstate, bstate, stats, _ = col.collect(
                ts, cstate, bstate, warm_len, explore=True,
                explore_param=1.0 if self.warmup_random else 0.0,
            )
            env_step += stats.n_collected_steps * n_proc

        stop_triggered = False
        epoch = 0
        for epoch in range(1, self.max_epoch + 1):
            steps_this_epoch = 0
            while steps_this_epoch < self.step_per_epoch:
                explore_param = float(self.train_param_fn(epoch, env_step))
                cstate, bstate, stats, _ = col.collect(
                    ts, cstate, bstate, segment_len, explore=True,
                    explore_param=explore_param,
                )
                for _ in range(updates_per_segment):
                    key, k_u = jax.random.split(key)  # lockstep learn key
                    k_s = jax.random.fold_in(k_u, 1 + pid)  # local sampling
                    sampled = self.algo.presample(
                        self.buffer, bstate, k_s, batch_local
                    )
                    # assemble the dp-sharded global batch from the local
                    # shard; np.asarray pulls the local sample host-side
                    # (the host->device feed of the env-sharded design)
                    sampled_np = jax.tree.map(np.asarray, sampled)
                    sampled_g = host_shard_pytree(
                        sampled_np, mesh, self.axis_name
                    )
                    ts_pre = ts
                    ts, metrics = global_update(ts, sampled_g, k_u)
                    if is_per:
                        # same key as the update: algorithms that sample
                        # inside their target mirror the update's splits,
                        # making the recomputed priority exact
                        if prio_takes_offset:
                            scores = prio_fn(
                                ts_pre, sampled, k_u,
                                row_offset=pid * batch_local,
                            )
                        else:
                            scores = prio_fn(ts_pre, sampled, k_u)
                        bstate = self.buffer.update_priorities(
                            bstate, sampled[0], sampled[1], scores
                        )
                    grad_step += 1
                env_step += steps_per_segment
                steps_this_epoch += steps_per_segment
                last_metrics = {k: float(v) for k, v in metrics.items()}
                if self.logger is not None and pid == 0:
                    self.logger.log_train_data(
                        {
                            "env_step": env_step,
                            **(
                                {"returns_mean": stats.returns_mean}
                                if stats.returns.size
                                else {}
                            ),
                            **last_metrics,
                        },
                        env_step,
                    )

            # test phase: every process evaluates with the SAME key, then
            # the per-process means are all-gathered and averaged so every
            # process proceeds from IDENTICAL numbers.  With deterministic
            # (pure-JAX) test envs the gather is a no-op equality check;
            # with nondeterministic host envs it is what prevents one
            # process stopping while another enters the next collective
            # (a silent multi-host hang).
            key, k_test = jax.random.split(key)
            test_stats = self.test_collector.collect_episodes(
                ts, k_test, self.episode_per_test,
                explore=False, explore_param=self.test_param,
            )
            rew, rew_std = test_stats.returns_mean, test_stats.returns_std
            if n_proc > 1:
                from jax.experimental import multihost_utils

                gathered = multihost_utils.process_allgather(
                    np.asarray([rew, rew_std], np.float64)
                )
                rew = float(np.mean(gathered[..., 0]))
                rew_std = float(np.mean(gathered[..., 1]))
            if rew > best_reward:
                best_reward, best_reward_std = rew, rew_std
            if self.logger is not None and pid == 0:
                self.logger.log_test_data(
                    {"returns_mean": rew, "returns_std": rew_std}, env_step
                )
            if self.stop_fn is not None and self.stop_fn(rew):
                stop_triggered = True
                break

        self.train_state = ts
        self.buffer_state = bstate
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


class DistributedOnPolicyTrainer:
    """SPMD on-policy training over ``jax.process_count()`` processes —
    the distributed counterpart of :class:`~tianshou_tpu.trainer.onpolicy.
    OnPolicyTrainer`, completing the pod story for both trainer families.

    Invariants (mirroring :class:`DistributedOffPolicyTrainer`):

    - every process rolls out its OWN env shard with the local jitted
      collector (env-reset keys fold in the process index, so shards
      explore disjoint experience);
    - the per-process rollouts are assembled into ONE global trajectory
      whose env axis is dp-sharded over the global mesh
      (:func:`host_shard_pytree`; no host materializes global data);
    - the standard on-policy program — ``process_rollout`` (GAE),
      ``update_rollout_stats`` (PPO's return-rms), repeat x
      shuffled-minibatch ``learn`` — runs ONCE, jitted over the global
      mesh with replicated params.  Advantage statistics therefore see
      GLOBAL data and XLA derives both the cross-host stat reductions and
      the gradient all-reduce, so every process ends each segment with
      identical parameters;
    - epochs/tests/stopping run in lockstep off an identical PRNG chain,
      with the test means all-gathered exactly as in the off-policy
      trainer.
    """

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
        mesh=None,
        axis_name: str = "dp",
    ):
        self.algo = algo
        self.train_collector = train_collector
        self.test_collector = test_collector
        self.max_epoch = max_epoch
        self.step_per_epoch = step_per_epoch
        self.step_per_collect = step_per_collect
        self.repeat_per_collect = repeat_per_collect
        self.batch_size = batch_size
        self.episode_per_test = episode_per_test
        self.stop_fn = stop_fn
        self.logger = logger
        self.seed = seed
        self.mesh = mesh
        self.axis_name = axis_name

    def _build_global_learn(self, M: int):
        """``(ts, traj_env_major, key) -> (ts, metrics)`` jitted over the
        global mesh: the OnPolicyTrainer learn program over the assembled
        global trajectory (env-major ``[N_global, T, ...]`` leaves, the
        dp-sharded leading axis)."""
        import jax.numpy as jnp

        from tianshou_tpu.data.tree import tree_slice

        algo = self.algo
        bs = min(self.batch_size, M)
        nmb = max(1, M // bs)
        repeat = self.repeat_per_collect
        recompute = getattr(algo, "recompute_advantage", False)
        has_pre_learn = hasattr(algo, "pre_learn")

        def learn(ts, traj_env_major, key):
            # back to the time-major [T, N_global, ...] layout the
            # algorithm's rollout processing expects; the env axis keeps
            # its dp sharding
            traj = jax.tree.map(
                lambda x: jnp.swapaxes(x, 0, 1), traj_env_major
            )
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

                ts, metrics = jax.lax.scan(mb_body, ts, (perm, jnp.arange(nmb)))
                return ts, jax.tree.map(lambda m: m.mean(), metrics)

            keys = jax.random.split(key, repeat)
            ts, metrics = jax.lax.scan(repeat_body, ts, keys)
            metrics = jax.tree.map(lambda m: m.mean(), metrics)
            metrics.update(pre_metrics)
            return ts, metrics

        return jax.jit(learn)

    def run(self) -> InfoStats:
        t_start = time.time()
        n_proc = jax.process_count()
        pid = jax.process_index()
        mesh = self.mesh if self.mesh is not None else global_mesh(self.axis_name)
        col = self.train_collector
        local_envs = col.venv.num_envs
        global_envs = local_envs * n_proc
        segment_len = max(1, self.step_per_collect // global_envs)
        steps_per_segment = segment_len * global_envs
        M = steps_per_segment
        updates_per_segment = self.repeat_per_collect * max(
            1, M // min(self.batch_size, M)
        )

        key = jax.random.key(self.seed)
        k_init, k_reset, key = jax.random.split(key, 3)
        cstate = col.reset(jax.random.fold_in(k_reset, pid))
        ts = self.algo.init(k_init, jax.tree.map(lambda x: x[0], cstate.obs))
        learn = self._build_global_learn(M)

        env_step = 0
        grad_step = 0
        best_reward, best_reward_std = -np.inf, 0.0
        last_metrics: dict = {}
        stop_triggered = False
        epoch = 0
        for epoch in range(1, self.max_epoch + 1):
            steps_this_epoch = 0
            while steps_this_epoch < self.step_per_epoch:
                cstate, _, stats, traj = col.collect(
                    ts, cstate, None, segment_len, explore=True,
                    record_traj=True,
                )
                # local [T, N_local, ...] -> env-major shard -> global
                # dp-sharded trajectory (leading axis = global env axis)
                traj_local = jax.tree.map(
                    lambda x: np.moveaxis(np.asarray(x), 1, 0), traj
                )
                traj_g = host_shard_pytree(traj_local, mesh, self.axis_name)
                key, k_u = jax.random.split(key)  # lockstep learn key
                ts, metrics = learn(ts, traj_g, k_u)
                env_step += steps_per_segment
                steps_this_epoch += steps_per_segment
                grad_step += updates_per_segment
                last_metrics = {k: float(v) for k, v in metrics.items()}
                if self.logger is not None and pid == 0:
                    self.logger.log_train_data(
                        {
                            "env_step": env_step,
                            **(
                                {"returns_mean": stats.returns_mean}
                                if stats.returns.size
                                else {}
                            ),
                            **last_metrics,
                        },
                        env_step,
                    )

            # lockstep test phase (see DistributedOffPolicyTrainer.run)
            key, k_test = jax.random.split(key)
            test_stats = self.test_collector.collect_episodes(
                ts, k_test, self.episode_per_test, explore=False
            )
            rew, rew_std = test_stats.returns_mean, test_stats.returns_std
            if n_proc > 1:
                from jax.experimental import multihost_utils

                gathered = multihost_utils.process_allgather(
                    np.asarray([rew, rew_std], np.float64)
                )
                rew = float(np.mean(gathered[..., 0]))
                rew_std = float(np.mean(gathered[..., 1]))
            if rew > best_reward:
                best_reward, best_reward_std = rew, rew_std
            if self.logger is not None and pid == 0:
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
