"""SAC on MuJoCo via the host-env bridge (analog of
``examples/mujoco/mujoco_sac.py``; BASELINE.md off-policy rows).

Reference hyperparameters: hidden 256x256, actor/critic lr 1e-3, alpha lr
3e-4 (auto), tau 5e-3, batch 256, buffer 1M, start-timesteps 10k random,
1 update per env step.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="HalfCheetah-v4")
    p.add_argument("--platform", default=None)
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument("--test-envs", type=int, default=10)  # reference test_num=10 (mujoco_sac.py:43)
    p.add_argument("--max-epoch", type=int, default=200)
    p.add_argument("--step-per-epoch", type=int, default=5000)
    p.add_argument("--step-per-collect", type=int, default=8)
    p.add_argument("--update-per-step", type=float, default=1.0)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--buffer-size", type=int, default=1000000)
    p.add_argument("--start-timesteps", type=int, default=10000)
    p.add_argument("--seed", type=int, default=0)
    # reference defaults: fixed alpha 0.2 (mujoco_sac.py:31-32 — auto-alpha
    # is opt-in there too, and the published benchmarks use the defaults)
    p.add_argument("--alpha", type=float, default=0.2)
    p.add_argument("--auto-alpha", action="store_true")
    p.add_argument("--logdir", default=None)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import gymnasium as gym
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tianshou_tpu.algos.sac import SAC
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.host import HostVectorEnv, space_from_gym
    from tianshou_tpu.networks.continuous import CriticEnsemble, GaussianActor
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer
    from tianshou_tpu.utils.logger import TensorboardLogger

    make = lambda: gym.make(args.task)
    probe = make()
    act_space = space_from_gym(probe.action_space)
    act_dim = act_space.shape[0]
    probe.close()

    algo = SAC(
        actor=GaussianActor((256, 256), act_dim, conditioned_sigma=True),
        critic=CriticEnsemble((256, 256), num_critics=2),
        action_space=act_space,
        actor_lr=1e-3,
        critic_lr=1e-3,
        alpha=args.alpha,
        alpha_lr=3e-4,
        auto_alpha=args.auto_alpha,
        tau=0.005,
        gamma=0.99,
    )
    buffer = ReplayBuffer(
        capacity=args.buffer_size // args.num_envs, num_envs=args.num_envs
    )
    train_venv = HostVectorEnv([make for _ in range(args.num_envs)])
    test_venv = HostVectorEnv([make for _ in range(args.test_envs)])
    logger = TensorboardLogger(
        args.logdir or f"log/sac_{args.task}_{args.seed}_{int(time.time())}"
    )
    trainer = OffPolicyTrainer(
        algo,
        HostCollector(algo, train_venv, buffer),
        HostCollector(algo, test_venv),
        buffer,
        max_epoch=args.max_epoch,
        step_per_epoch=args.step_per_epoch,
        step_per_collect=args.step_per_collect * args.num_envs,
        update_per_step=args.update_per_step,
        batch_size=args.batch_size,
        episode_per_test=args.test_envs,
        warmup_steps=args.start_timesteps,
        seed=args.seed,
        logger=logger,
    )
    t0 = time.time()
    info = trainer.run()
    dt = time.time() - t0
    print(
        f"SAC/{args.task}: best={info.best_reward:.1f}±{info.best_reward_std:.1f} "
        f"env_steps={info.env_step} wall={dt:.0f}s steps/s={info.env_step/dt:.0f}"
    )
    train_venv.close()
    test_venv.close()
    return info


if __name__ == "__main__":
    main()
