"""PPO / A2C / PG on pure-JAX classic-control envs (analog of
``test/continuous/test_ppo.py`` and ``test/discrete/test_{pg,a2c,ppo}.py``)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--algo", default="ppo", choices=["ppo", "a2c", "pg"])
    p.add_argument("--env", default="Pendulum-v1")
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--max-epoch", type=int, default=15)
    p.add_argument("--step-per-epoch", type=int, default=30000)
    p.add_argument("--step-per-collect", type=int, default=2048)
    p.add_argument("--repeat", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tianshou_tpu.algos.a2c import A2C
    from tianshou_tpu.algos.pg import PG
    from tianshou_tpu.algos.ppo import PPO
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import make_env
    from tianshou_tpu.envs.spaces import Discrete
    from tianshou_tpu.networks.common import MLP, QNet
    from tianshou_tpu.networks.continuous import GaussianActor, ValueNet
    from tianshou_tpu.trainer.onpolicy import OnPolicyTrainer

    env = make_env(args.env)
    discrete = isinstance(env.action_space, Discrete)
    if discrete:
        actor = QNet((64, 64), env.action_space.n)  # logits head
        threshold = 195.0
        gamma, gae_lambda = 0.99, 0.95
    else:
        actor = GaussianActor((64, 64), env.action_space.shape[0])
        threshold = -250.0
        gamma, gae_lambda = 0.95, 0.95
    critic = ValueNet((64, 64))

    if args.algo == "ppo":
        algo = PPO(
            actor, critic, env.action_space,
            lr=args.lr, gamma=gamma, gae_lambda=gae_lambda,
            eps_clip=0.2, vf_coef=0.5, ent_coef=0.0,
            max_grad_norm=0.5, adv_norm=True, value_clip=False,
        )
    elif args.algo == "a2c":
        algo = A2C(
            actor, critic, env.action_space,
            lr=args.lr, gamma=gamma, gae_lambda=gae_lambda,
            vf_coef=0.5, ent_coef=0.01, max_grad_norm=0.5,
        )
    else:
        algo = PG(actor, env.action_space, lr=args.lr, gamma=gamma, ret_norm=True)

    trainer = OnPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, args.num_envs)),
        Collector(algo, VectorEnv(env, args.num_envs)),
        max_epoch=args.max_epoch,
        step_per_epoch=args.step_per_epoch,
        step_per_collect=args.step_per_collect,
        repeat_per_collect=args.repeat,
        batch_size=args.batch_size,
        episode_per_test=10,
        stop_fn=lambda rew: rew >= threshold,
        seed=args.seed,
    )
    t0 = time.time()
    info = trainer.run()
    dt = time.time() - t0
    print(
        f"{args.algo}/{args.env}: best={info.best_reward:.1f}±{info.best_reward_std:.1f} "
        f"epochs={info.epoch} env_steps={info.env_step} wall={dt:.1f}s "
        f"stop={info.stop_triggered}"
    )
    return info


if __name__ == "__main__":
    main()
