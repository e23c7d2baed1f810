"""REINFORCE on MuJoCo via the host-env bridge (analog of
``examples/mujoco/mujoco_reinforce.py``; BASELINE.md on-policy rows).

Reference hyperparameters: hidden 64x64, lr 1e-3 with linear decay over
updates, gamma 0.99, 10 envs, 2048 steps/collect, repeat 1, ONE
whole-rollout minibatch, obs + return normalization, state-independent
sigma (init -0.5, downscaled mu head).  The reference squashes sampled
actions with tanh (its ablation found it a hair better); this package's
PG uses the clip bound, the reference's other documented-good option.
Published budgets are 3M/10M steps; parity runs here use a reduced
budget with the band noted in docs/PERFORMANCE.md.
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
    p.add_argument("--num-envs", type=int, default=10)
    p.add_argument("--test-envs", type=int, default=10)  # reference test_num=10 (mujoco_sac.py:43)
    p.add_argument("--max-epoch", type=int, default=100)
    p.add_argument("--step-per-epoch", type=int, default=30000)
    p.add_argument("--step-per-collect", type=int, default=2048)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--no-lr-decay", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--logdir", default=None)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import gymnasium as gym
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import optax

    from tianshou_tpu.algos.pg import PG
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.envs.host import NormObsHostVectorEnv, space_from_gym
    from tianshou_tpu.networks.continuous import GaussianActor
    from tianshou_tpu.trainer.onpolicy import OnPolicyTrainer
    from tianshou_tpu.utils.logger import TensorboardLogger

    make = lambda: gym.make(args.task)
    probe = make()
    act_space = space_from_gym(probe.action_space)
    probe.close()

    total_updates = args.max_epoch * -(-args.step_per_epoch // args.step_per_collect)
    lr = (
        args.lr
        if args.no_lr_decay
        else optax.linear_schedule(args.lr, 0.0, total_updates)
    )
    algo = PG(
        GaussianActor((64, 64), act_space.shape[0], sigma_init=-0.5),
        act_space,
        optimizer=optax.adam(lr),
        gamma=0.99,
        ret_norm=True,
    )
    train_venv = NormObsHostVectorEnv([make for _ in range(args.num_envs)])
    test_venv = NormObsHostVectorEnv(
        [make for _ in range(args.test_envs)], update_rms=False
    )
    test_venv.set_rms(train_venv.get_rms())
    logger = TensorboardLogger(
        args.logdir or f"log/reinforce_{args.task}_{args.seed}_{int(time.time())}"
    )
    trainer = OnPolicyTrainer(
        algo,
        HostCollector(algo, train_venv),
        HostCollector(algo, test_venv),
        max_epoch=args.max_epoch,
        step_per_epoch=args.step_per_epoch,
        step_per_collect=args.step_per_collect,
        repeat_per_collect=1,
        batch_size=10**9,  # whole-rollout update (reference batch_size=None)
        episode_per_test=args.test_envs,
        seed=args.seed,
        logger=logger,
    )
    t0 = time.time()
    info = trainer.run()
    dt = time.time() - t0
    print(
        f"REINFORCE/{args.task}: best={info.best_reward:.1f}"
        f"±{info.best_reward_std:.1f} env_steps={info.env_step} "
        f"wall={dt:.0f}s steps/s={info.env_step/dt:.0f}"
    )
    train_venv.close()
    test_venv.close()
    return info


if __name__ == "__main__":
    main()
