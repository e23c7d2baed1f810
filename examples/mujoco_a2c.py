"""A2C on MuJoCo via the host-env bridge (analog of
``examples/mujoco/mujoco_a2c.py``; BASELINE.md on-policy rows).

Reference hyperparameters (``mujoco_a2c.py`` defaults): hidden 64x64,
RMSprop lr 7e-4 (eps 1e-5, alpha .99) with linear decay over updates,
gamma 0.99, GAE 0.95, 16 envs, 80 steps/collect (bootstrap length 5),
repeat 1, ONE whole-rollout minibatch per update, obs + return
normalization, vf_coef 0.5, ent_coef 0.01, grad clip 0.5, clip action
bounding, state-independent sigma init -0.5.  (The reference uses tanh
hidden activations; we keep the package default relu, same as our PPO
parity runs.)
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
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--test-envs", type=int, default=10)  # reference test_num=10 (mujoco_sac.py:43)
    p.add_argument("--max-epoch", type=int, default=100)
    p.add_argument("--step-per-epoch", type=int, default=10000)
    p.add_argument("--step-per-collect", type=int, default=80)
    p.add_argument("--lr", type=float, default=7e-4)
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

    from tianshou_tpu.algos.a2c import A2C
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.envs.host import NormObsHostVectorEnv, space_from_gym
    from tianshou_tpu.networks.continuous import GaussianActor, ValueNet
    from tianshou_tpu.trainer.onpolicy import OnPolicyTrainer
    from tianshou_tpu.utils.logger import TensorboardLogger

    make = lambda: gym.make(args.task)
    probe = make()
    act_space = space_from_gym(probe.action_space)
    probe.close()

    # reference lr decay: linear to zero over every update step (one update
    # per collect at repeat=1/whole-batch, mujoco_a2c.py:136-141)
    total_updates = args.max_epoch * -(-args.step_per_epoch // args.step_per_collect)
    lr = (
        args.lr
        if args.no_lr_decay
        else optax.linear_schedule(args.lr, 0.0, total_updates)
    )
    tx = optax.rmsprop(lr, decay=0.99, eps=1e-5)
    algo = A2C(
        GaussianActor((64, 64), act_space.shape[0], sigma_init=-0.5),
        ValueNet((64, 64)),
        act_space,
        optimizer=tx,
        gamma=0.99,
        gae_lambda=0.95,
        vf_coef=0.5,
        ent_coef=0.01,
        max_grad_norm=0.5,
        ret_norm=True,
    )
    train_venv = NormObsHostVectorEnv([make for _ in range(args.num_envs)])
    test_venv = NormObsHostVectorEnv(
        [make for _ in range(args.test_envs)], update_rms=False
    )
    test_venv.set_rms(train_venv.get_rms())  # shared live statistics
    logger = TensorboardLogger(
        args.logdir or f"log/a2c_{args.task}_{args.seed}_{int(time.time())}"
    )
    trainer = OnPolicyTrainer(
        algo,
        HostCollector(algo, train_venv),
        HostCollector(algo, test_venv),
        max_epoch=args.max_epoch,
        step_per_epoch=args.step_per_epoch,
        step_per_collect=args.step_per_collect,
        repeat_per_collect=1,
        batch_size=10**9,  # reference batch_size=None: whole-rollout update
        episode_per_test=args.test_envs,
        seed=args.seed,
        logger=logger,
    )
    t0 = time.time()
    info = trainer.run()
    dt = time.time() - t0
    print(
        f"A2C/{args.task}: best={info.best_reward:.1f}±{info.best_reward_std:.1f} "
        f"env_steps={info.env_step} wall={dt:.0f}s steps/s={info.env_step/dt:.0f}"
    )
    train_venv.close()
    test_venv.close()
    return info


if __name__ == "__main__":
    main()
