"""PPO on MuJoCo via the host-env bridge with obs normalization (analog of
``examples/mujoco/mujoco_ppo.py``; BASELINE.md on-policy rows).

Reference hyperparameters (``examples/mujoco/mujoco_ppo.py`` defaults):
hidden 64x64, lr 3e-4 with linear decay, gamma 0.99, GAE 0.95, 8 envs,
2048 steps/collect, repeat 10, batch 64, obs+ret normalization, NO adv
norm, recompute-adv, sigma_param init -0.5.
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
    p.add_argument("--max-epoch", type=int, default=100)
    p.add_argument("--step-per-epoch", type=int, default=10000)
    p.add_argument("--step-per-collect", type=int, default=2048)
    p.add_argument("--repeat", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--no-lr-decay", action="store_true")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import gymnasium as gym
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tianshou_tpu.algos.ppo import PPO
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.envs.host import NormObsHostVectorEnv, space_from_gym
    from tianshou_tpu.networks.continuous import GaussianActor, ValueNet
    from tianshou_tpu.trainer.onpolicy import OnPolicyTrainer
    from tianshou_tpu.utils.logger import TensorboardLogger

    make = lambda: gym.make(args.task)
    probe = make()
    act_space = space_from_gym(probe.action_space)
    probe.close()

    import optax

    # reference lr-decay: linear to zero over every optimizer step
    # (LambdaLR over updates, mujoco_ppo.py:118-126)
    total_minibatches = (
        args.max_epoch
        * -(-args.step_per_epoch // args.step_per_collect)
        * args.repeat
        * -(-args.step_per_collect // args.batch_size)
    )
    tx = None
    if not args.no_lr_decay:
        tx = optax.adam(
            optax.linear_schedule(args.lr, 0.0, total_minibatches)
        )
    algo = PPO(
        GaussianActor((64, 64), act_space.shape[0], sigma_init=-0.5),
        ValueNet((64, 64)),
        act_space,
        lr=args.lr,
        optimizer=tx,
        gamma=0.99,
        gae_lambda=0.95,
        eps_clip=0.2,
        vf_coef=0.25,
        ent_coef=0.0,
        max_grad_norm=0.5,
        adv_norm=False,
        ret_norm=True,
        recompute_advantage=True,
    )
    train_venv = NormObsHostVectorEnv([make for _ in range(args.num_envs)])
    test_venv = NormObsHostVectorEnv(
        [make for _ in range(args.test_envs)], update_rms=False
    )
    test_venv.set_rms(train_venv.get_rms())  # shared live statistics
    logger = TensorboardLogger(
        f"log/ppo_{args.task}_{args.seed}_{int(time.time())}"
    )
    trainer = OnPolicyTrainer(
        algo,
        HostCollector(algo, train_venv),
        HostCollector(algo, test_venv),
        max_epoch=args.max_epoch,
        step_per_epoch=args.step_per_epoch,
        step_per_collect=args.step_per_collect,
        repeat_per_collect=args.repeat,
        batch_size=args.batch_size,
        episode_per_test=args.test_envs,
        seed=args.seed,
        logger=logger,
    )
    t0 = time.time()
    info = trainer.run()
    dt = time.time() - t0
    print(
        f"PPO/{args.task}: best={info.best_reward:.1f}±{info.best_reward_std:.1f} "
        f"env_steps={info.env_step} wall={dt:.0f}s steps/s={info.env_step/dt:.0f}"
    )
    train_venv.close()
    test_venv.close()
    return info


if __name__ == "__main__":
    main()
