"""DQN CartPole through the native C++ env pool, end to end — plus a
``--bench`` mode comparing raw env throughput of the pool vs the
gymnasium-based ``HostVectorEnv`` on the identical task (the reference's
EnvPool value proposition: ``examples/mujoco/README.md:34`` claims 2-3x
pure-step speedup; measured numbers live in docs/PERFORMANCE.md).

The pool's expensive-simulator representative is ``Reacher2`` (RK4 x 4
substeps of 2-link manipulator dynamics per control step,
``native/cpp_envpool.cpp``); its throughput row is reported alongside.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(num_envs: int, steps: int):
    import numpy as np

    from tianshou_tpu.envs.cpp_pool import CppVectorEnv
    from tianshou_tpu.envs.host import HostVectorEnv

    rows = []

    def time_env(name, env, act_fn):
        env.reset(seed=0)
        act = act_fn()
        for _ in range(10):  # warmup
            env.step(act)
        t0 = time.perf_counter()
        for _ in range(steps):
            env.step(act_fn())
        dt = time.perf_counter() - t0
        rows.append((name, num_envs * steps / dt))
        env.close()

    rng = np.random.default_rng(0)
    time_env(
        "cpp_pool CartPole-v1",
        CppVectorEnv("CartPole-v1", num_envs, seed=0),
        lambda: rng.integers(0, 2, num_envs),
    )

    import gymnasium as gym

    time_env(
        "host_venv CartPole-v1 (gymnasium)",
        HostVectorEnv([lambda: gym.make("CartPole-v1")] * num_envs),
        lambda: rng.integers(0, 2, num_envs),
    )
    time_env(
        "cpp_pool Reacher2 (RK4 manipulator)",
        CppVectorEnv("Reacher2", num_envs, seed=0),
        lambda: rng.uniform(-1, 1, (num_envs, 2)).astype(np.float32),
    )
    print(f"\nenv-step throughput, {num_envs} envs x {steps} steps:")
    for name, sps in rows:
        print(f"  {name:42s} {sps:12,.0f} env-steps/s")
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bench", action="store_true",
                   help="throughput comparison instead of training")
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--bench-steps", type=int, default=2000)
    p.add_argument("--platform", default=None)
    p.add_argument("--max-epoch", type=int, default=4)
    p.add_argument("--step-per-epoch", type=int, default=10000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.bench:
        bench(args.num_envs, args.bench_steps)
        return None

    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.cpp_pool import CppVectorEnv
    from tianshou_tpu.envs.spaces import Discrete
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    algo = DQN(
        network=QNet((128, 128, 128), 2),
        action_space=Discrete(2),
        lr=1e-3, gamma=0.9, n_step=3, target_update_freq=320,
    )
    buffer = ReplayBuffer(capacity=2000, num_envs=args.num_envs)
    trainer = OffPolicyTrainer(
        algo,
        HostCollector(
            algo, CppVectorEnv("CartPole-v1", args.num_envs, seed=args.seed),
            buffer,
        ),
        HostCollector(
            algo, CppVectorEnv("CartPole-v1", args.num_envs, seed=args.seed + 99),
        ),
        buffer,
        max_epoch=args.max_epoch,
        step_per_epoch=args.step_per_epoch,
        step_per_collect=10 * args.num_envs,
        update_per_step=0.1,
        batch_size=64,
        train_param_fn=lambda e, s: 0.1,
        stop_fn=lambda rew: rew >= 195,
        warmup_steps=1000,
        seed=args.seed,
    )
    t0 = time.time()
    info = trainer.run()
    dt = time.time() - t0
    print(
        f"DQN/CartPole-v1 (cpp_pool): best={info.best_reward:.1f} "
        f"env_steps={info.env_step} wall={dt:.0f}s steps/s={info.env_step / dt:.0f}"
    )
    return info


if __name__ == "__main__":
    main()
