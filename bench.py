"""Driver benchmark: three stages, MXU-heavy first, headline JSON last.

Stages (each stage is an independent fused off-policy DQN pipeline —
jitted collector rollout + ring-buffer writes + batched-presample n-step
update scan — at the reference's 6.4 sampled-transitions-per-env-step
training ratio):

1. ``atari_bench`` — NatureCNN on 84x84x4 uint8 frames (synthetic pixel
   env; ALE is absent from this image and the line says so), batch-512
   bf16 updates.  This is the Atari-scale workload where the MXU is the
   bottleneck; the line reports env-steps/s AND MFU from XLA cost
   analysis against bf16 peak.
2. ``conv_bench`` — MinAtar Breakout ConvDQN (10x10x4 grids), the
   realistic small-pixel *learning* workload, with MFU.
3. headline — MLP DQN CartPole pipeline (1024 on-device envs), printed as
   the FINAL JSON line for the driver's parser.

Stage order is deliberate: round 2's conv stage starved because the
headline compiled first and consumed the wall-clock budget
(VERDICT.md weak #1).  Conv stages now run first under their own budgets;
the headline always runs and is always the last line.

Compile-latency hygiene: the persistent XLA compile cache is enabled
explicitly (config knobs, not just the env var — min-entry/min-time
thresholds are zeroed so every executable persists).  A warm cache turns
the 60-320s tunnel compiles into sub-second loads; the repo's round
workflow warms /tmp/jax_cache before the driver's run.

Baseline: the reference (Tianshou v1.0.0) publishes no env-steps/s tables
(BASELINE.md); its CartPole DQN test config (test/discrete/test_dqn.py:
10 subprocess envs + CPU/GPU learner) sustains on the order of 1.5k
env-steps/s end to end.  vs_baseline is measured against that estimate.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE_DIR = os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

BASELINE_STEPS_PER_SEC = 1500.0

NUM_ENVS = 1024
SEGMENT_LEN = 64  # steps per env per superstep
BATCH_SIZE = 1024
# reference ratio: 6.4 sampled transitions per env step
UPDATES_PER_SEGMENT = max(1, round(6.4 * NUM_ENVS * SEGMENT_LEN / BATCH_SIZE))

# MXU peak for MFU accounting (TPU v5e: ~197 TFLOP/s bf16; fall back to a
# nominal CPU figure when benching off-device so the number stays defined)
PEAK_FLOPS = {"tpu": 197e12, "cpu": 1e11}


def _bench_pipeline(algo, env, num_envs, segment_len, batch_size,
                    updates_per_segment, n_iters=5, explore_param=0.1,
                    buffer_capacity=64, buffer_kwargs=None):
    """Build the fused superstep for (algo, env) and time it.  Returns
    (env_steps_per_sec, seconds_per_iter, superstep_fn, args)."""
    import jax

    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    venv = VectorEnv(env, num_envs)
    buffer = ReplayBuffer(
        capacity=buffer_capacity, num_envs=num_envs, **(buffer_kwargs or {})
    )
    collector = Collector(algo, venv, buffer)
    trainer = OffPolicyTrainer(
        algo, collector, collector, buffer,
        max_epoch=1, step_per_epoch=1,
        step_per_collect=num_envs * segment_len,
        update_per_step=updates_per_segment / (num_envs * segment_len),
        batch_size=batch_size,
    )
    _bench_pipeline.last_trainer = trainer  # layouts marker for the stage line
    key = jax.random.key(0)
    cstate = collector.reset(key)
    ts = algo.init(jax.random.key(1), jax.tree.map(lambda x: x[0], cstate.obs))
    bstate = buffer.init(collector.example_transition(ts, cstate))
    # AOT path (lower -> compile -> call the executable): on the axon
    # tunnel the jit dispatch path stalls for many minutes on conv-heavy
    # programs even with a warm persistent cache, while the AOT compile
    # hits the cache in sub-second time and the executable call is clean.
    # Layout-pinned compile: XLA-chosen parameter layouts, carried state
    # pinned in==out (drops two whole-buffer transposing copies per
    # superstep on pixel storage; see OffPolicyTrainer._compile_superstep).
    compiled = trainer._compile_superstep(ts, cstate, bstate)

    def superstep(ts, cstate, bstate, key, p):
        return compiled(ts, cstate, bstate, key, p)

    # warmup: execute + fill buffer.  NOTE: fetch a concrete value to force
    # execution — on the axon platform block_until_ready can return before
    # the computation actually finishes.
    for i in range(2):
        ts, cstate, bstate, outputs, metrics = superstep(
            ts, cstate, bstate, jax.random.key(10 + i), explore_param
        )
    first = next(iter(metrics.values()))
    float(first)

    t0 = time.perf_counter()
    for i in range(n_iters):
        ts, cstate, bstate, outputs, metrics = superstep(
            ts, cstate, bstate, jax.random.key(100 + i), explore_param
        )
    float(next(iter(metrics.values())))
    dt = time.perf_counter() - t0

    steps = n_iters * num_envs * segment_len
    return steps / dt, dt / n_iters, compiled, (ts, cstate, bstate)


def _program_flops(compiled):
    """'flops' of the compiled superstep per XLA cost analysis.  CAUTION:
    XLA counts each ``lax.scan``/while body ONCE, not times the trip
    count, so for the k-update + T-step-rollout supersteps this is a
    severe undercount; it is reported for transparency only and MFU uses
    the trip-count-corrected estimate from :func:`_pipeline_flops`."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _forward_flops(network, params, obs_batch):
    """FLOPs of one batched network forward via cost analysis of the
    standalone (scan-free) program."""
    import jax

    c = jax.jit(network.apply).lower(params, obs_batch).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0))


def _pipeline_flops(algo, obs_shape, obs_dtype, params, num_envs, seg, batch,
                    updates):
    """Trip-count-corrected FLOPs of one superstep.

    update step = online fwd + bwd (~2x fwd) + target fwd  ->  4x fwd(batch);
    rollout step = online fwd(num_envs).  Loss/optimizer elementwise work is
    negligible next to the convs and is ignored (underestimates MFU
    slightly, which is the honest direction).
    """
    import jax.numpy as jnp

    f_batch = _forward_flops(
        algo.network, params, jnp.zeros((batch,) + obs_shape, obs_dtype)
    )
    f_envs = _forward_flops(
        algo.network, params, jnp.zeros((num_envs,) + obs_shape, obs_dtype)
    )
    return updates * 4.0 * f_batch + seg * f_envs


def _conv_stage(name, env, encoder, num_envs, seg, batch, peak, platform,
                gamma=0.99, extra=None, buffer_kwargs=None):
    """Run one conv-pipeline stage and print its diagnostic line."""
    import jax

    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.networks.conv import ConvQNet

    updates = max(1, round(6.4 * num_envs * seg / batch))
    algo = DQN(
        network=ConvQNet(num_actions=env.action_space.n, encoder=encoder),
        action_space=env.action_space,
        lr=1e-3, gamma=gamma, n_step=3, target_update_freq=1000,
    )
    sps, dt, compiled, args = _bench_pipeline(
        algo, env, num_envs, seg, batch, updates, n_iters=3,
        buffer_kwargs=buffer_kwargs,
    )
    ts = args[0]
    obs = jax.tree.leaves(args[1].obs)[0]
    flops = _pipeline_flops(
        algo, tuple(obs.shape[1:]), obs.dtype, ts.params,
        num_envs, seg, batch, updates,
    )
    program_flops = _program_flops(compiled)
    mfu = (flops / dt) / peak if flops else 0.0
    line = {
        "metric": name,
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "layouts": getattr(
            _bench_pipeline.last_trainer, "last_superstep_layouts", "plain"
        ),
        "batch_size": batch,
        "updates_per_superstep": updates,
        "flops_per_superstep": flops,
        "flops_program_scan_bodies_once": program_flops,
        "achieved_flops_per_sec": round(flops / dt, 3) if flops else 0.0,
        "mfu_vs_bf16_peak": round(mfu, 4),
        "platform": platform,
    }
    if extra:
        line.update(extra)
    return line


def _host_stage(platform):
    """SAC HalfCheetah through the host-env bridge at the reference config
    (8 gymnasium envs + device learner, 64-step collects, 1 update/step) —
    the operating mode real MuJoCo users feel.  Reports steady-state
    env-steps/s over a 12.8k-step training slice (excludes warmup +
    compile)."""
    import time as _t

    import gymnasium as gym
    import jax

    from tianshou_tpu.algos.sac import SAC
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.host import HostVectorEnv, space_from_gym
    from tianshou_tpu.networks.continuous import CriticEnsemble, GaussianActor
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    make = lambda: gym.make("HalfCheetah-v4")
    probe = make()
    act_space = space_from_gym(probe.action_space)
    probe.close()
    algo = SAC(
        actor=GaussianActor((256, 256), act_space.shape[0], conditioned_sigma=True),
        critic=CriticEnsemble((256, 256), num_critics=2),
        action_space=act_space,
        auto_alpha=False,
    )
    buffer = ReplayBuffer(capacity=40_000 // 8, num_envs=8)
    train_venv = HostVectorEnv([make for _ in range(8)])
    test_venv = HostVectorEnv([make for _ in range(2)])
    def make_trainer(max_epoch, step_per_epoch):
        return OffPolicyTrainer(
            algo,
            HostCollector(algo, train_venv, buffer),
            HostCollector(algo, test_venv),
            buffer,
            max_epoch=max_epoch,
            step_per_epoch=step_per_epoch,
            step_per_collect=64,
            update_per_step=1.0,
            batch_size=256,
            episode_per_test=1,
            warmup_steps=2000,
            seed=0,
        )

    # warm pass fills the in-process + persistent compile caches so the
    # timed pass measures steady-state host-loop throughput, not compiles
    make_trainer(1, 640).run()
    info = make_trainer(2, 6400).run()
    train_venv.close()
    test_venv.close()
    # steps/s over the trained slice only (duration includes one test
    # episode per epoch; honest-downward)
    trained = info.env_step
    sps = trained / info.duration
    return {
        "metric": "sac_halfcheetah_host_steps_per_sec",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "config": "8 gym envs, spc=64, UTD 1.0, batch 256",
        "platform": platform,
    }


def _init_jax():
    import jax

    # Persistent compile cache: the env var alone is not sufficient on all
    # platforms; set the config knobs and zero the persistence thresholds so
    # every stage's executable is cached (cold->warm: ~12s->0.4s observed).
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    platform = jax.devices()[0].platform
    peak = PEAK_FLOPS.get("tpu" if platform not in ("cpu",) else "cpu")
    return platform, peak


def _run_stage(stage: str) -> None:
    """Run one conv stage and print its diagnostic line (subprocess entry)."""
    platform, peak = _init_jax()
    if stage == "atari":
        from tianshou_tpu.envs.synthetic import SyntheticPixelEnv

        # Workload note (round-4 measurement): the reference's Atari memory
        # regime (stack_num=4 + save_only_last_obs + ignore_obs_next, an
        # 8x smaller ring) was benched via buffer_kwargs and came out ~8%
        # SLOWER here (39.4k vs 42.7k steps/s) — the 4 chained prev-gathers
        # per sampled stack cost more than the ring shrink saves at this
        # buffer size.  The stage keeps the stored-stack layout for
        # cross-round continuity; details in docs/PERFORMANCE.md.
        line = _conv_stage(
            "dqn_atari84_naturecnn_env_steps_per_sec",
            SyntheticPixelEnv(84, 84, 4, num_actions=6),
            "nature", num_envs=128, seg=16, batch=512,
            peak=peak, platform=platform,
            extra={"frames": "synthetic 84x84x4 uint8 (ALE absent from image)"},
        )
        print("atari_bench: " + json.dumps(line), flush=True)
    elif stage == "conv":
        from tianshou_tpu.envs.minatar import make_minatar

        line = _conv_stage(
            "dqn_minatar_breakout_conv_env_steps_per_sec",
            make_minatar("breakout"), "minatar",
            num_envs=256, seg=32, batch=512, peak=peak, platform=platform,
        )
        print("conv_bench: " + json.dumps(line), flush=True)
    elif stage == "host":
        line = _host_stage(platform)
        print("host_bench: " + json.dumps(line), flush=True)


def main():
    # ---- conv stages in TIMEOUT-GUARDED subprocesses -----------------------
    # A wall-clock budget inside one process cannot preempt a running XLA
    # compile; running each stage in its own subprocess with a hard timeout
    # guarantees the headline JSON line (the driver's parse contract) is
    # always emitted, no matter how long a cold conv compile takes.
    import subprocess

    stage_timeout = float(os.environ.get("BENCH_STAGE_TIMEOUT_S", "240"))
    # The atari stage first tries AUTO parameter layouts (+14% superstep,
    # docs/PERFORMANCE.md): AUTO executables can only be used by the
    # process that compiled them on this backend, so the attempt pays an
    # in-process conv compile (~5 min) under a longer timeout, and any
    # failure or timeout falls back to the plain warm-cache run below.
    auto_timeout = float(os.environ.get("BENCH_AUTO_TIMEOUT_S", "720"))

    def run_stage(stage, tag, env_extra=None, timeout=None):
        try:
            env = dict(os.environ, **(env_extra or {}))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", stage],
                capture_output=True, text=True,
                timeout=timeout or stage_timeout, env=env,
            )
            for ln in r.stdout.splitlines():
                if ln.startswith(tag + ":"):
                    print(ln, flush=True)
                    return True
            tail = (r.stdout + r.stderr).strip().splitlines()[-1:]
            print(f"{tag}: attempt failed (rc={r.returncode} {tail})", flush=True)
        except subprocess.TimeoutExpired:
            print(f"{tag}: attempt timed out", flush=True)
        except Exception as e:
            print(f"{tag}: attempt failed ({type(e).__name__}: {e})", flush=True)
        return False

    if not run_stage(
        "atari", "atari_bench",
        env_extra={"TIANSHOU_TPU_AUTO_LAYOUT": "compile"},
        timeout=auto_timeout,
    ):
        if not run_stage("atari", "atari_bench"):
            print("atari_bench: skipped (both attempts failed)", flush=True)
    for stage, tag in (("conv", "conv_bench"), ("host", "host_bench")):
        if not run_stage(stage, tag):
            print(f"{tag}: skipped", flush=True)

    # ---- headline: MLP DQN CartPole pipeline (always runs, always last) ----
    _init_jax()
    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.common import QNet

    env = CartPole()
    algo = DQN(
        network=QNet(hidden_sizes=(128, 128, 128), num_actions=2),
        action_space=env.action_space,
        lr=1e-3, gamma=0.9, n_step=3, target_update_freq=320,
    )
    sps, dt_iter, superstep, args = _bench_pipeline(
        algo, env, NUM_ENVS, SEGMENT_LEN, BATCH_SIZE, UPDATES_PER_SEGMENT
    )

    print(
        json.dumps(
            {
                "metric": "dqn_cartpole_pipeline_env_steps_per_sec",
                "value": round(sps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        _run_stage(sys.argv[2])
    else:
        main()
