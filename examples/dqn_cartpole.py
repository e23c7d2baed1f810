"""DQN on pure-JAX CartPole-v1 — the minimum end-to-end slice.

Analog of the reference's ``test/discrete/test_dqn.py`` integration run:
reward >= 195 stops training.  Run with ``--platform cpu`` to force the
virtual-CPU backend (default uses whatever jax picks, i.e. TPU under axon).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--num-envs", type=int, default=10)
    p.add_argument("--buffer-size", type=int, default=20000)
    p.add_argument("--max-epoch", type=int, default=10)
    p.add_argument("--step-per-epoch", type=int, default=10000)
    p.add_argument("--step-per-collect", type=int, default=100)
    p.add_argument("--update-per-step", type=float, default=0.1)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--n-step", type=int, default=3)
    p.add_argument("--target-update-freq", type=int, default=320)
    p.add_argument("--eps-train", type=float, default=0.1)
    p.add_argument("--eps-test", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    env = CartPole()
    train_venv = VectorEnv(env, args.num_envs)
    test_venv = VectorEnv(env, args.num_envs)
    algo = DQN(
        network=QNet(hidden_sizes=(128, 128, 128), num_actions=2),
        action_space=env.action_space,
        lr=args.lr,
        gamma=args.gamma,
        n_step=args.n_step,
        target_update_freq=args.target_update_freq,
    )
    buffer = ReplayBuffer(
        capacity=args.buffer_size // args.num_envs, num_envs=args.num_envs
    )
    trainer = OffPolicyTrainer(
        algo,
        Collector(algo, train_venv, buffer),
        Collector(algo, test_venv),
        buffer,
        max_epoch=args.max_epoch,
        step_per_epoch=args.step_per_epoch,
        step_per_collect=args.step_per_collect,
        update_per_step=args.update_per_step,
        batch_size=args.batch_size,
        episode_per_test=10,
        train_param_fn=lambda epoch, step: args.eps_train,
        test_param=args.eps_test,
        stop_fn=lambda rew: rew >= 195,
        warmup_steps=1000,
        seed=args.seed,
    )
    t0 = time.time()
    info = trainer.run()
    dt = time.time() - t0
    print(
        f"best_reward={info.best_reward:.1f}±{info.best_reward_std:.1f} "
        f"epochs={info.epoch} env_steps={info.env_step} "
        f"grad_steps={info.gradient_step} wall={dt:.1f}s "
        f"steps/s={info.env_step / dt:.0f} stop={info.stop_triggered}"
    )
    return info


if __name__ == "__main__":
    main()
