"""Dueling DQN on Box2D LunarLander via the host-env bridge (analog of
``examples/box2d/lunarlander_dqn.py``; the reference's box2d example
tree).

Reference hyperparameters (``lunarlander_dqn.py`` defaults): dueling
128x128, lr 0.013, eps_train 0.73, n_step 4, target update 500, 16 envs,
16 steps/collect, update/step 0.0625, batch 128, 10 epochs x 80k steps,
solved at test return >= 200.  The other box2d tasks route through the
generic examples (``mujoco_sac.py --task BipedalWalker-v3`` for the
bipedal SAC example; any gymnasium Box2D id works through the same host
bridge).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="LunarLander-v3")
    p.add_argument("--platform", default=None)
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--test-envs", type=int, default=5)
    p.add_argument("--max-epoch", type=int, default=10)
    p.add_argument("--step-per-epoch", type=int, default=80000)
    p.add_argument("--step-per-collect", type=int, default=16)
    p.add_argument("--update-per-step", type=float, default=0.0625)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--buffer-size", type=int, default=100000)
    p.add_argument("--lr", type=float, default=0.013)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--n-step", type=int, default=4)
    p.add_argument("--target-update-freq", type=int, default=500)
    p.add_argument("--eps-train", type=float, default=0.73)
    p.add_argument("--eps-test", type=float, default=0.01)
    p.add_argument("--stop-reward", type=float, default=200.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--logdir", default=None)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import gymnasium as gym
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.host import HostVectorEnv, space_from_gym
    from tianshou_tpu.networks.common import DuelingQNet
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer
    from tianshou_tpu.utils.logger import TensorboardLogger

    make = lambda: gym.make(args.task)
    probe = make()
    act_space = space_from_gym(probe.action_space)
    probe.close()

    algo = DQN(
        network=DuelingQNet((128, 128), act_space.n),
        action_space=act_space,
        lr=args.lr,
        gamma=args.gamma,
        n_step=args.n_step,
        target_update_freq=args.target_update_freq,
    )
    buffer = ReplayBuffer(
        capacity=args.buffer_size // args.num_envs, num_envs=args.num_envs
    )
    train_venv = HostVectorEnv([make for _ in range(args.num_envs)])
    test_venv = HostVectorEnv([make for _ in range(args.test_envs)])
    logger = TensorboardLogger(
        args.logdir or f"log/lunar_dqn_{args.seed}_{int(time.time())}"
    )
    trainer = OffPolicyTrainer(
        algo,
        HostCollector(algo, train_venv, buffer),
        HostCollector(algo, test_venv),
        buffer,
        max_epoch=args.max_epoch,
        step_per_epoch=args.step_per_epoch,
        step_per_collect=args.step_per_collect,
        update_per_step=args.update_per_step,
        batch_size=args.batch_size,
        episode_per_test=args.test_envs,
        # reference exp decay: eps_train * (1-5e-6)^env_step, floored at
        # eps_test (lunarlander_dqn.py train_fn)
        train_param_fn=lambda e, s: max(
            args.eps_train * (1.0 - 5e-6) ** s, args.eps_test
        ),
        test_param=args.eps_test,
        stop_fn=(
            (lambda rew: rew >= args.stop_reward) if args.stop_reward else None
        ),
        test_in_train=True,
        warmup_steps=args.batch_size * args.num_envs,
        seed=args.seed,
        logger=logger,
    )
    t0 = time.time()
    info = trainer.run()
    dt = time.time() - t0
    print(
        f"DQN/{args.task}: best={info.best_reward:.1f}±{info.best_reward_std:.1f} "
        f"env_steps={info.env_step} wall={dt:.0f}s steps/s={info.env_step/dt:.0f}"
    )
    train_venv.close()
    test_venv.close()
    return info


if __name__ == "__main__":
    main()
