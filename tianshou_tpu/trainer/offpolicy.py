"""Off-policy trainer: fused (collect -> k gradient steps) super-steps.

TPU-native counterpart of the reference ``OffpolicyTrainer``
(``tianshou/trainer/base.py:608-644``): the per-collect loop of
``Collector.collect`` + ``round(update_per_step * n_collected)`` calls to
``policy.update`` becomes ONE jitted super-step — a rollout ``lax.scan``
followed by an update ``lax.scan`` — so an entire collect/update cycle is a
single XLA program.  Epoch boundaries, test episodes, early stopping and
checkpoint hooks stay in Python (they are not hot), mirroring the reference's
``BaseTrainer`` epoch iterator (``trainer/base.py:36-583``).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algos.base import Algorithm, TrainState
from tianshou_tpu.collect.collector import CollectState, Collector, CollectStats
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.data.stats import InfoStats
from tianshou_tpu.collect.collector import rollout_segment
from tianshou_tpu.trainer.hooks import MetricSmoother, RunContext

__all__ = ["OffPolicyTrainer", "build_update_scan"]


def build_update_scan(algo: Algorithm, buffer: ReplayBuffer, batch_size: int,
                      n_updates: int):
    """Build ``(ts, bstate, key) -> (ts, bstate, mean_metrics)``: the
    k-update scan shared by the trainers.

    When the algorithm factors its update into ``presample`` +
    ``update_sampled`` and sampling is update-independent (uniform replay —
    PER priorities change between updates, so PER keeps per-update
    sampling for exact reference semantics), ALL ``k * batch`` indices,
    importance weights and n-step chains are gathered in ONE call outside
    the scan; the scan body is then pure compute (targets + SGD), which
    removes the per-iteration gather latency that dominated the update
    scan at MLP scale (docs/PERFORMANCE.md round-1 profiling).
    """
    from tianshou_tpu.algos.base import Algorithm
    from tianshou_tpu.data.prio import PrioritizedReplayBuffer

    presampled = (
        getattr(algo, "supports_presampled", False)
        # a subclass that overrides update() (DRQN's sequence update, CQL's
        # regularized step, ...) while inheriting a parent's
        # supports_presampled must NOT be silently bypassed in favor of the
        # parent's update_sampled — honor the override
        and type(algo).update is Algorithm.update
        and not isinstance(buffer, PrioritizedReplayBuffer)
    )

    if presampled:

        def updates(ts, bstate, key):
            k_s, k_l = jax.random.split(key)
            sampled = algo.presample(buffer, bstate, k_s, n_updates * batch_size)
            views = jax.tree.map(
                lambda x: x.reshape((n_updates, batch_size) + x.shape[1:]),
                sampled,
            )
            keys = jax.random.split(k_l, n_updates)

            def upd(carry, xs):
                ts_c, bst = carry
                s, k = xs
                ts_c, bst, metrics = algo.update_sampled(ts_c, buffer, bst, s, k)
                return (ts_c, bst), metrics

            (ts, bstate), metrics = jax.lax.scan(upd, (ts, bstate), (views, keys))
            return ts, bstate, jax.tree.map(lambda m: m.mean(), metrics)

    else:

        def updates(ts, bstate, key):
            def upd(carry, k):
                ts_c, bst = carry
                ts_c, bst, metrics = algo.update(ts_c, buffer, bst, k, batch_size)
                return (ts_c, bst), metrics

            keys = jax.random.split(key, n_updates)
            (ts, bstate), metrics = jax.lax.scan(upd, (ts, bstate), keys)
            return ts, bstate, jax.tree.map(lambda m: m.mean(), metrics)

    return updates


class OffPolicyTrainer:
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
        save_best_fn: Callable[[TrainState], None] | None = None,
        save_checkpoint_fn: Callable[[int, int, int], None] | None = None,
        resume_from_log: bool = False,
        test_in_train: bool = False,
        show_progress: bool = False,
        profile_dir: str | None = None,
        smooth_window: int = 1,
        pipeline_host_updates: bool = False,
        fused_fine_host: bool | None = None,
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
        # Default explore-param: the ALGORITHM's own exploration noise
        # (DDPG/TD3 carry sigma; the reference attaches noise to the
        # policy, ddpg.py:214-224).  A bare 0.0 default silently disabled
        # Gaussian exploration for deterministic-actor algorithms whenever
        # the caller didn't pass a schedule (round-3 TD3 parity regression).
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
        self.save_best_fn = save_best_fn
        self.save_checkpoint_fn = save_checkpoint_fn
        self.resume_from_log = resume_from_log
        self.test_in_train = test_in_train
        self.show_progress = show_progress
        self.profile_dir = profile_dir
        self.smooth_window = smooth_window
        # host path: overlap env stepping of segment s+1 with the device
        # update scan of segment s (double-buffered feed, the role of the
        # reference's shmem/EnvPool pipelining, env/worker/subproc.py:34-76).
        # Costs one segment of acting-parameter staleness during
        # collection.  DEFAULT OFF (strictly sequential reference
        # semantics): the staleness measurably destabilizes TD3's delayed
        # deterministic actor (HalfCheetah seed 0: 1977 pipelined vs 9911
        # sequential, log/parity/td3_hc_s0*), while SAC/DDPG tolerate it —
        # opt in for throughput when the algorithm is robust to it.
        self.pipeline_host_updates = pipeline_host_updates
        # fused fine-grained host cycle (see _build_fused_cycle): None=auto
        # (on whenever applicable), False=never, True=require
        self.fused_fine_host = fused_fine_host
        self._superstep = None

        num_envs = train_collector.venv.num_envs
        # steps per env per collect segment (reference counts total env steps)
        self.segment_len = max(1, step_per_collect // num_envs)
        self.steps_per_segment = self.segment_len * num_envs
        self.updates_per_segment = max(
            1, round(update_per_step * self.steps_per_segment)
        )

    # ------------------------------------------------------------------
    def _build_superstep(self, auto_layout: bool = False):
        algo, buffer = self.algo, self.buffer
        seg = rollout_segment(
            algo,
            self.train_collector.venv,
            buffer,
            self.segment_len,
            explore=True,
            record_traj=False,
        )
        updates_fn = build_update_scan(
            algo, buffer, self.batch_size, self.updates_per_segment
        )

        def superstep(ts, cstate, bstate, key, explore_param):
            cstate, bstate, outputs = seg(ts, cstate, bstate, explore_param)
            ts, bstate, metrics = updates_fn(ts, bstate, key)
            return ts, cstate, bstate, outputs, metrics

        if auto_layout:
            self._superstep_raw = superstep
        return jax.jit(superstep, donate_argnums=(2,))

    def _compile_superstep(self, ts, cstate, bstate):
        """AOT-compile the superstep, with XLA-chosen parameter layouts.

        Default (row-major) layouts can disagree with what the rollout
        writer and the presample gather want for pixel replay storage
        (u8[E, cap, 84, 84, 4]); XLA then inserts TWO transposing copies of
        the ENTIRE ring buffer per superstep (round-4 trace: ~8 ms at bench
        scale, arbitrarily worse at real buffer sizes).  The fix is the
        two-step layout-inference pattern: (1) compile with AUTO in/out
        layouts to discover XLA's preferred parameter layouts, (2)
        recompile pinning inputs AND outputs of the carried state
        (ts/cstate/bstate) to those layouts, so the carry cycles through
        the executable zero-copy (AUTO alone lets XLA pick DIFFERENT
        input/output layouts and the second call rejects its own first
        call's outputs).  Host-fetched outputs/metrics keep default
        layouts.  Falls back to the plain AOT path on backends without
        layout control."""
        example = (ts, cstate, bstate, jax.random.key(0), 0.0)
        jitted = self._build_superstep(auto_layout=True)
        # AUTO layouts cut the atari-scale superstep 48->42 ms (+14%: the
        # two whole-ring transposing copies vanish; round-4 trace), but
        # they can only be used by the PROCESS THAT COMPILED them on this
        # backend, so they are gated behind an explicit mode
        # (TIANSHOU_TPU_AUTO_LAYOUT):
        #
        # - "compile": lower with AUTO in/out layouts and compile fresh,
        #   in-process, with the XLA persistent cache quarantined (an AUTO
        #   executable written under a plain entry's key poisons it —
        #   round-4 failure, reproduced and root-caused this round).  The
        #   compile costs minutes for conv supersteps and is amortized by
        #   any real training run; bench.py opts its atari stage in.
        # - unset/"1"/"0": plain deterministic layouts (persistent-cache
        #   friendly, sub-second warm compiles).
        #
        # Caching AUTO executables ACROSS processes was engineered and is
        # impossible on this backend: jax.experimental.serialize_executable
        # round-trips them (verified, incl. uint8 ring + scan + donation +
        # PRNG keys at >10 MB payloads), but a deserialized executable
        # demands inputs already in its non-default parameter layouts, and
        # NOTHING outside an executable can construct those here — device->
        # device device_put, host->device device_put with an explicit
        # Format, and a jitted identity with pinned out_shardings all
        # produce a DIFFERENT physical layout than requested (measured:
        # asked (3,1,2,0)/(8,128)-tiled, got (1,2,3,0)/(4,128)).  Only the
        # compiling process's jit entry path can feed it.  Full story:
        # docs/PERFORMANCE.md.
        import os as _os

        mode = _os.environ.get("TIANSHOU_TPU_AUTO_LAYOUT", "")
        self.last_superstep_layouts = "plain"
        if mode == "1":
            print(
                "[auto-layout] TIANSHOU_TPU_AUTO_LAYOUT=1 is no longer an "
                "opt-in (AUTO executables cannot be cached across processes "
                "on this backend); use =compile to build AUTO layouts "
                "in-process. Running with plain layouts.",
                flush=True,
            )
        if mode != "compile":
            return jitted.lower(*example).compile()
        # Build the plain fallback FIRST, while the persistent cache is
        # still reachable (warm hit = sub-second): compile_uncached below
        # quarantines the cache for the REST OF THE PROCESS, so a fallback
        # compiled after it would be a cold multi-minute compile.
        plain = jitted.lower(*example).compile()
        try:
            import jax.numpy as jnp

            from jax._src.layout import AutoLayout
            from jax.experimental.layout import Format

            from tianshou_tpu.utils.aot_cache import compile_uncached

            auto = Format(AutoLayout())
            lowered = jax.jit(
                self._superstep_raw,
                donate_argnums=(2,),
                in_shardings=(auto,) * 5,
                out_shardings=(auto,) * 5,
            ).lower(*example)
            c = compile_uncached(lowered)
            # Validate the executable actually cycles: XLA may choose
            # DIFFERENT input/output layouts for the carried state, in
            # which case the second call rejects the first call's outputs
            # ("compiled for input layouts that disagree...").  Probe two
            # cycles on a COPY of the buffer state (the probe donates it)
            # including a metrics fetch; any failure -> default layouts.
            # Note: pinning the discovered layouts instead is NOT an
            # option — forced non-default layouts pessimize the gather
            # paths by 20-250x on this backend (round-4 measurements).
            bcopy = jax.tree.map(jnp.copy, bstate)
            o = c(ts, cstate, bcopy, jax.random.key(0), 0.0)
            o = c(o[0], o[1], o[2], jax.random.key(1), 0.0)
            float(jax.tree.leaves(o[4])[0])
            del o, bcopy
            self.last_superstep_layouts = "auto"
            return c
        except Exception as exc:
            # always visible: a silent fallback would let a plain-layout
            # measurement masquerade as an AUTO one downstream
            print(f"[auto-layout] falling back to plain layouts: {exc!r}",
                  flush=True)
            if _os.environ.get("TIANSHOU_TPU_AUTO_DEBUG"):
                import traceback

                traceback.print_exc()
            return plain

    # ------------------------------------------------------------------
    def _fused_fine_applicable(self, traj) -> bool:
        """The fused fine-grained cycle applies when each collect segment is
        ONE step per env (``step_per_collect == num_envs``), collection is
        strictly sequential, observations are flat arrays and the policy
        emits no per-step extras (recurrent state would need round-tripping).
        """
        if self.fused_fine_host is False:
            return False
        conditions = {
            "step_per_collect == num_envs (one step per env per cycle)":
                self.segment_len == 1,
            "pipeline_host_updates is off":
                not self.pipeline_host_updates,
            "flat (non-dict) observations":
                not isinstance(self.train_collector.obs, dict),
            "policy emits no per-step extras":
                "policy" not in traj,
            "no MARL reward_metric":
                self.train_collector.reward_metric is None,
        }
        failed = [name for name, ok in conditions.items() if not ok]
        if failed and self.fused_fine_host is True:
            raise ValueError(
                "fused_fine_host=True but the fused fine cycle is not "
                f"applicable; failed condition(s): {'; '.join(failed)}"
            )
        return not failed

    def _build_fused_cycle(self):
        """Build the fused fine-grained host cycle: ONE jitted program per
        collect/update cycle that (a) writes the previous transition batch
        into the device ring buffer, (b) runs the k-update scan, and (c)
        computes the NEXT action with the freshly updated parameters.

        This is the reference's 1-update-per-env-step regime
        (``mujoco_sac.py`` ``step_per_collect=1``) made affordable over a
        high-latency accelerator link: the host blocks once per cycle on the
        action fetch (~1 RTT) instead of paying separate round trips for the
        acting-parameter sync, the trajectory upload and the update dispatch
        (docs/PERFORMANCE.md round-4 host-path notes).  Semantics are
        strictly sequential — actions always come from the post-update
        parameters, exactly like the reference's collect -> update loop.
        Because the action for step s+1 is computed inside cycle s, the
        caller passes the exploration-schedule value for the step the
        action EXECUTES at (``train_param_fn(epoch, env_step +
        steps_per_segment)``), keeping epsilon/noise schedules exactly
        aligned with the reference's per-step evaluation.
        """
        algo, buffer = self.algo, self.buffer
        updates_fn = build_update_scan(
            algo, buffer, self.batch_size, self.updates_per_segment
        )
        from tianshou_tpu.utils.transfer import TreePacker

        packer: dict = {}

        def cycle(ts, bstate, flat, raw_act, base_key, ctr, explore_param):
            h = packer["p"].unpack(flat)
            traj = Batch(
                obs=h["obs"][None],
                act=raw_act[None],
                rew=h["rew"][None],
                terminated=h["terminated"][None],
                truncated=h["truncated"][None],
                obs_next=h["obs_next"][None],
            )
            bstate = buffer.add_trajectory(bstate, traj)
            k = jax.random.fold_in(base_key, ctr)
            k_u, k_act = jax.random.split(k)
            ts, bstate, metrics = updates_fn(ts, bstate, k_u)
            a, _ = algo.act(ts, h["carry"], k_act, True, explore_param)
            return ts, bstate, a, algo.map_action(a), metrics

        def act_only(ts, obs, base_key, ctr, explore_param):
            k = jax.random.fold_in(base_key, ctr)
            _, k_act = jax.random.split(k)
            a, _ = algo.act(ts, obs, k_act, True, explore_param)
            return a, algo.map_action(a)

        # NOT donating ts: freshly initialized train states alias buffers
        # (target params == params), and donating an aliased pytree is a
        # runtime error ("attempt to donate the same buffer twice")
        jit_cycle = jax.jit(cycle, donate_argnums=(1,))
        jit_act = jax.jit(act_only)
        accel = jax.devices()[0]

        class Engine:
            """Per-run state of the fused loop (current raw action stays
            device-resident between cycles; only the env action is fetched)."""

            def __init__(eng):
                eng.raw_act = None
                eng.env_act_np = None
                eng.base_key = None

            def prime(eng, ts, seed, ctr, explore_param):
                eng.base_key = jax.device_put(
                    jax.random.key(np.uint32(seed) ^ np.uint32(0xF05ED)), accel
                )
                col = self.train_collector
                obs_dev = jax.device_put(np.asarray(col.obs), accel)
                eng.raw_act, env_act = jit_act(
                    ts, obs_dev, eng.base_key, ctr, explore_param
                )
                eng.env_act_np = np.asarray(env_act)

            def segment(eng, ts, bstate, ctr, explore_param):
                col = self.train_collector
                res, carry = col.venv.step(eng.env_act_np)
                done = res.terminated | res.truncated
                col._accumulate_rew(res.reward)
                col.ep_len += 1
                returns, lens = [], []
                if done.any():
                    returns = col._episode_metric(col.ep_ret[done]).tolist()
                    lens = col.ep_len[done].tolist()
                    col.ep_ret[done] = 0
                    col.ep_len[done] = 0
                h = {
                    "obs": np.asarray(col.obs),
                    "rew": res.reward,
                    "terminated": res.terminated,
                    "truncated": res.truncated,
                    "obs_next": res.obs,
                    "carry": carry,
                }
                col.obs = carry
                if "p" not in packer:
                    packer["p"] = TreePacker(h)
                flat = jax.device_put(packer["p"].pack(h), accel)
                ts, bstate, eng.raw_act, env_act, metrics = jit_cycle(
                    ts, bstate, flat, eng.raw_act, eng.base_key, ctr,
                    explore_param,
                )
                # the ONLY forced device sync of the cycle
                eng.env_act_np = np.asarray(env_act)
                stats = CollectStats(
                    n_collected_steps=col.venv.num_envs,
                    n_collected_episodes=len(returns),
                    returns=np.asarray(returns),
                    lens=np.asarray(lens, np.int64),
                )
                return ts, bstate, metrics, stats

        return Engine()

    # ------------------------------------------------------------------
    def _build_host_step(self):
        """One jitted program per host-path segment: write the segment's
        ``[T, N, ...]`` trajectory into the device ring buffer, then run the
        k-update scan — one dispatch per collect/update cycle (the
        host↔device analog of the fully fused device super-step)."""
        buffer = self.buffer
        updates_fn = build_update_scan(
            self.algo, buffer, self.batch_size, self.updates_per_segment
        )

        from tianshou_tpu.utils.transfer import TreePacker

        packer: dict = {}

        def step(ts, bstate, flat, key):
            traj = packer["p"].unpack(flat)
            bstate = buffer.add_trajectory(bstate, traj)
            return updates_fn(ts, bstate, key)

        jitted = jax.jit(step, donate_argnums=(1,))
        accel = jax.devices()[0]

        def run(ts, bstate, traj, key):
            # the segment crosses the host->accelerator link as ONE flat
            # float32 buffer (one round trip) instead of per-leaf
            # transfers; unpacking happens inside the jitted program.
            # This also re-commits act_on_host leaves off the CPU backend.
            if "p" not in packer:
                packer["p"] = TreePacker(jax.tree.map(np.asarray, traj))
            flat = jax.device_put(packer["p"].pack(traj), accel)
            return jitted(ts, bstate, flat, key)

        return run

    def _run_host(self) -> InfoStats:
        """Training loop over host-process (gymnasium) envs: threaded env
        stepping + device updates (the reference's normal mode of
        operation, SURVEY.md §3.1, with EnvPool-style batched feeding)."""
        t_start = time.time()
        # fresh smoothing state per run (repeated run() calls must not
        # inherit the previous run's moving averages)
        self.smooth = MetricSmoother(self.smooth_window)
        key = jax.random.key(self.seed)
        k_init, key = jax.random.split(key)
        col = self.train_collector
        col.reset(seed=self.seed)
        ts = self.algo.init(k_init, jnp.asarray(col.obs[0]))
        # derive buffer schema from a single host step
        key, k_w = jax.random.split(key)
        bstate = None
        bstate_probe, stats, traj = col.collect(
            ts, None, 1, k_w, explore=True, explore_param=1.0, record_traj=True
        )
        accel = jax.devices()[0]
        example = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x)[0, 0], accel), traj
        )
        bstate = self.buffer.init(example)

        env_step = 0
        grad_step = 0
        start_epoch = 0
        if self.resume_from_log and self.logger is not None:
            start_epoch, env_step, grad_step = self.logger.restore_data()
        best_reward, best_reward_std = -np.inf, 0.0
        last_metrics: dict = {}
        if self.warmup_steps > 0:
            warm_len = max(1, self.warmup_steps // col.venv.num_envs)
            key, k_warm = jax.random.split(key)
            # reference warm-up semantics: UNIFORM random actions
            # (collect(random=True)), not noisy policy actions
            bstate, stats, _ = col.collect(
                ts, bstate, warm_len, k_warm, explore=True,
                explore_param=0.0, random=self.warmup_random,
            )
            env_step += stats.n_collected_steps

        fused = self._fused_fine_applicable(traj)
        self.last_run_used_fused = fused
        engine = self._build_fused_cycle() if fused else None
        host_step = None if fused else self._build_host_step()
        stop_triggered = False
        epoch = 0
        # Pipelined feed: ``ts_act`` holds the params the collector acts
        # with.  With pipelining, acting uses the params from *before* the
        # in-flight update scan, so the host steps segment s+1's envs while
        # the device runs segment s's updates (JAX async dispatch supplies
        # the double buffering); metrics are logged one segment late to
        # avoid forcing a sync.  All ``ts``/``bstate`` bindings below are
        # device futures — only np.asarray/float force completion.
        ts_act = ts
        metrics = None
        # each device->host fetch costs a full tunnel round trip, so train
        # metrics are pulled in ONE stacked transfer roughly every ~4k env
        # steps instead of per segment
        metrics_interval = max(1, 4096 // max(1, self.steps_per_segment))
        # collection randomness lives on the host CPU backend: splitting a
        # device key per segment would cost an accelerator dispatch (and,
        # inside the collector, a key transfer) per segment
        cpu = None
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            pass
        key_c_chain = jax.device_put(
            jax.random.key(np.uint32(self.seed) ^ np.uint32(0x5EED)), cpu
        )
        seg_count = 0
        with RunContext(
            (self.max_epoch - start_epoch) * self.step_per_epoch,
            self.show_progress, self.profile_dir, desc="offpolicy",
        ) as rc:
            for epoch in range(start_epoch + 1, self.max_epoch + 1):
                steps_this_epoch = 0
                while steps_this_epoch < self.step_per_epoch:
                    explore_param = float(self.train_param_fn(epoch, env_step))
                    if fused:
                        if engine.env_act_np is None:
                            engine.prime(ts, self.seed, seg_count, explore_param)
                        if metrics is not None and seg_count % metrics_interval == 0:
                            vals = np.asarray(jnp.stack(list(metrics.values())))
                            last_metrics = self.smooth(
                                dict(zip(metrics.keys(), vals.tolist()))
                            )
                        seg_count += 1
                        # the action computed INSIDE this cycle executes at
                        # env_step + steps_per_segment, so it gets the
                        # schedule value for THAT step (exact reference
                        # exploration-schedule alignment)
                        next_param = float(
                            self.train_param_fn(
                                epoch, env_step + self.steps_per_segment
                            )
                        )
                        ts, bstate, metrics, stats = engine.segment(
                            ts, bstate, seg_count, next_param
                        )
                    else:
                        key, k_u = jax.random.split(key)
                        key_c_chain, k_c = jax.random.split(key_c_chain)
                        _, stats, traj = col.collect(
                            ts_act, None, self.segment_len, k_c,
                            explore=True, explore_param=explore_param,
                            record_traj=True,
                        )
                        if metrics is not None and seg_count % metrics_interval == 0:
                            vals = np.asarray(
                                jnp.stack(list(metrics.values()))
                            )
                            last_metrics = self.smooth(
                                dict(zip(metrics.keys(), vals.tolist()))
                            )
                        seg_count += 1
                        ts_prev = ts
                        ts, bstate, metrics = host_step(ts, bstate, traj, k_u)
                        ts_act = ts_prev if self.pipeline_host_updates else ts
                    env_step += self.steps_per_segment
                    steps_this_epoch += self.steps_per_segment
                    grad_step += self.updates_per_segment
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
                            ts, k_tt, self.episode_per_test,
                            explore=False, explore_param=self.test_param,
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
                    ts, k_test, self.episode_per_test,
                    explore=False, explore_param=self.test_param,
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

    def run(self) -> InfoStats:
        if getattr(self.train_collector, "is_host_collector", False):
            return self._run_host()
        t_start = time.time()
        self.smooth = MetricSmoother(self.smooth_window)
        rng = np.random.default_rng(self.seed)
        key = jax.random.key(self.seed)
        k_init, k_reset, key = jax.random.split(key, 3)

        # init states
        cstate = self.train_collector.reset(k_reset)
        ts = self.algo.init(
            k_init, jax.tree.map(lambda x: x[0], cstate.obs)
        )
        example = self.train_collector.example_transition(ts, cstate)
        bstate = self.buffer.init(example)

        env_step = 0
        grad_step = 0
        start_epoch = 0
        if self.resume_from_log and self.logger is not None:
            start_epoch, env_step, grad_step = self.logger.restore_data()
        best_reward = -np.inf
        best_reward_std = 0.0
        last_metrics: dict = {}
        train_time_collect = 0.0

        # warm-up collection (reference start_timesteps, agent.py:129-136)
        if self.warmup_steps > 0:
            warm_len = max(
                1, self.warmup_steps // self.train_collector.venv.num_envs
            )
            warm_param = 1.0 if self.warmup_random else 0.0
            cstate, bstate, stats, _ = self.train_collector.collect(
                ts, cstate, bstate, warm_len, explore=True, explore_param=warm_param
            )
            env_step += stats.n_collected_steps

        if self._superstep is None:
            # AOT (lower -> compile): identical executable to the jit
            # dispatch path, but the compile goes through the persistent
            # cache deterministically — on the tunneled-TPU platform the
            # jit path has been observed to stall for minutes recompiling
            # conv-heavy supersteps that the AOT path loads in <1s.
            # layout-pinned AOT (kills whole-ring relayout copies on pixel
            # buffers, see _compile_superstep); falls back internally.
            compiled = self._compile_superstep(ts, cstate, bstate)
            self._superstep = lambda *a: compiled(*a)

        stop_triggered = False
        epoch = 0
        with RunContext(
            (self.max_epoch - start_epoch) * self.step_per_epoch,
            self.show_progress, self.profile_dir, desc="offpolicy",
        ) as rc:
            for epoch in range(start_epoch + 1, self.max_epoch + 1):
                steps_this_epoch = 0
                epoch_train_rets: list[np.ndarray] = []
                while steps_this_epoch < self.step_per_epoch:
                    explore_param = float(self.train_param_fn(epoch, env_step))
                    key, k_step = jax.random.split(key)
                    t0 = time.time()
                    ts, cstate, bstate, outputs, metrics = self._superstep(
                        ts, cstate, bstate, k_step, explore_param
                    )
                    jax.block_until_ready(metrics)
                    train_time_collect += time.time() - t0
                    env_step += self.steps_per_segment
                    steps_this_epoch += self.steps_per_segment
                    grad_step += self.updates_per_segment
                    stats = Collector.summarize(outputs, self.steps_per_segment)
                    if stats.returns.size:
                        epoch_train_rets.append(stats.returns)
                    # opportunistic in-training test (trainer/base.py:469-510):
                    # when training returns already clear the bar, confirm with
                    # a real test phase and stop early
                    if (
                        self.test_in_train
                        and self.stop_fn is not None
                        and stats.returns.size
                        and self.stop_fn(stats.returns_mean)
                    ):
                        key, k_tt = jax.random.split(key)
                        tt = self.test_collector.collect_episodes(
                            ts, k_tt, self.episode_per_test,
                            explore=False, explore_param=self.test_param,
                        )
                        if self.stop_fn(tt.returns_mean):
                            best_reward = max(best_reward, tt.returns_mean)
                            best_reward_std = tt.returns_std
                            stop_triggered = True
                            break
                    last_metrics = self.smooth(
                        {k: float(v) for k, v in metrics.items()}
                    )
                    rc.step(self.steps_per_segment, last_metrics)
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
                # per-epoch checkpoint + counter save (trainer/base.py:340-345)
                if self.logger is not None:
                    self.logger.save_data(
                        epoch, env_step, grad_step, self.save_checkpoint_fn
                    )
                elif self.save_checkpoint_fn is not None:
                    self.save_checkpoint_fn(epoch, env_step, grad_step)

                # test phase
                key, k_test = jax.random.split(key)
                test_stats = self.test_collector.collect_episodes(
                    ts,
                    k_test,
                    self.episode_per_test,
                    explore=False,
                    explore_param=self.test_param,
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
        self.buffer_state = bstate
        duration = time.time() - t_start
        return InfoStats(
            gradient_step=grad_step,
            env_step=env_step,
            epoch=epoch,
            best_reward=float(best_reward),
            best_reward_std=float(best_reward_std),
            duration=duration,
            train_time=train_time_collect,
            stop_triggered=stop_triggered,
            last_metrics=last_metrics,
        )
