"""SAC on pure-JAX Pendulum-v1 (analog of ``test/continuous/test_sac_with_il.py``)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--algo", default="sac", choices=["sac", "td3", "ddpg"])
    p.add_argument("--num-envs", type=int, default=10)
    p.add_argument("--max-epoch", type=int, default=8)
    p.add_argument("--step-per-epoch", type=int, default=6000)
    p.add_argument("--step-per-collect", type=int, default=10)
    p.add_argument("--update-per-step", type=float, default=0.125)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tianshou_tpu.algos.ddpg import DDPG, TD3
    from tianshou_tpu.algos.sac import SAC
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import Pendulum
    from tianshou_tpu.networks.continuous import (
        CriticEnsemble,
        DeterministicActor,
        GaussianActor,
    )
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    env = Pendulum()
    act_dim = env.action_space.shape[0]
    if args.algo == "sac":
        algo = SAC(
            actor=GaussianActor((128, 128), act_dim, conditioned_sigma=True),
            critic=CriticEnsemble((128, 128), num_critics=2),
            action_space=env.action_space,
            actor_lr=1e-3,
            critic_lr=1e-3,
            auto_alpha=True,
        )
    elif args.algo == "td3":
        algo = TD3(
            actor=DeterministicActor((128, 128), act_dim),
            critic=CriticEnsemble((128, 128), num_critics=2),
            action_space=env.action_space,
            actor_lr=1e-3,
            critic_lr=1e-3,
            exploration_noise=0.1,
        )
    else:
        algo = DDPG(
            actor=DeterministicActor((128, 128), act_dim),
            critic=CriticEnsemble((128, 128), num_critics=1),
            action_space=env.action_space,
            actor_lr=1e-3,
            critic_lr=1e-3,
            exploration_noise=0.1,
        )

    buffer = ReplayBuffer(capacity=20000 // args.num_envs, num_envs=args.num_envs)
    trainer = OffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, args.num_envs), buffer),
        Collector(algo, VectorEnv(env, args.num_envs)),
        buffer,
        max_epoch=args.max_epoch,
        step_per_epoch=args.step_per_epoch,
        step_per_collect=args.step_per_collect * args.num_envs,
        update_per_step=args.update_per_step,
        batch_size=args.batch_size,
        episode_per_test=10,
        stop_fn=lambda rew: rew >= -250,
        warmup_steps=1000,
        seed=args.seed,
    )
    t0 = time.time()
    info = trainer.run()
    dt = time.time() - t0
    print(
        f"{args.algo}: best_reward={info.best_reward:.1f}±{info.best_reward_std:.1f} "
        f"epochs={info.epoch} env_steps={info.env_step} wall={dt:.1f}s "
        f"stop={info.stop_triggered}"
    )
    return info


if __name__ == "__main__":
    main()
