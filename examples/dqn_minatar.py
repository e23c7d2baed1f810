"""DQN on pure-JAX MinAtar games (Breakout/SpaceInvaders/Freeway/Asterix).

Analog of the reference's ``examples/atari/atari_dqn.py``: pixel
observations through a conv encoder.  Here the games themselves run on
device under ``vmap`` inside the jitted collector, so there is no host
emulator bottleneck — the whole loop (env step, conv forward, replay,
SGD) stays on the TPU.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--game", default="breakout",
                   choices=["breakout", "space_invaders", "freeway", "asterix", "seaquest"])
    p.add_argument("--platform", default=None)
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--buffer-size", type=int, default=100_000)
    p.add_argument("--max-epoch", type=int, default=10)
    p.add_argument("--step-per-epoch", type=int, default=100_000)
    p.add_argument("--step-per-collect", type=int, default=128)
    p.add_argument("--update-per-step", type=float, default=0.25)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--n-step", type=int, default=3)
    p.add_argument("--target-update-freq", type=int, default=1000)
    p.add_argument("--eps-train", type=float, default=0.1)
    p.add_argument("--eps-test", type=float, default=0.0)
    # MinAtar-paper exploration: linear 1.0 -> eps-train over the first
    # --eps-decay-steps env steps (0 = constant eps-train)
    p.add_argument("--eps-decay-steps", type=int, default=0)
    p.add_argument("--stop-reward", type=float, default=None)
    p.add_argument("--dueling", action="store_true")
    p.add_argument("--algo", default="dqn", choices=["dqn", "qrdqn"])
    p.add_argument("--num-quantiles", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--logdir", default=None)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.algos.qrdqn import QRDQN
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs import VectorEnv, make_minatar
    from tianshou_tpu.networks import ConvDuelingQNet, ConvQNet
    from tianshou_tpu.networks.conv import ConvQRDQNNet

    env = make_minatar(args.game)
    n_act = env.action_space.n
    train_venv = VectorEnv(env, args.num_envs)
    test_venv = VectorEnv(env, args.num_envs)
    if args.algo == "qrdqn":
        algo = QRDQN(
            network=ConvQRDQNNet(
                num_actions=n_act, num_quantiles=args.num_quantiles,
                encoder="minatar",
            ),
            action_space=env.action_space,
            num_quantiles=args.num_quantiles,
            lr=args.lr,
            gamma=args.gamma,
            n_step=args.n_step,
            target_update_freq=args.target_update_freq,
        )
    else:
        net_cls = ConvDuelingQNet if args.dueling else ConvQNet
        algo = DQN(
            network=net_cls(num_actions=n_act, encoder="minatar"),
            action_space=env.action_space,
            lr=args.lr,
            gamma=args.gamma,
            n_step=args.n_step,
            target_update_freq=args.target_update_freq,
        )
    buffer = ReplayBuffer(
        capacity=args.buffer_size // args.num_envs, num_envs=args.num_envs
    )
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer
    from tianshou_tpu.utils.logger import TensorboardLogger

    if args.eps_decay_steps > 0:

        def eps_fn(epoch, step):
            frac = min(1.0, step / args.eps_decay_steps)
            return 1.0 + frac * (args.eps_train - 1.0)

    else:
        eps_fn = lambda epoch, step: args.eps_train

    logger = (
        TensorboardLogger(args.logdir) if args.logdir else None
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
        train_param_fn=eps_fn,
        test_param=args.eps_test,
        stop_fn=(lambda rew: rew >= args.stop_reward) if args.stop_reward else None,
        warmup_steps=5000,
        seed=args.seed,
        logger=logger,
    )
    t0 = time.time()
    info = trainer.run()
    dt = time.time() - t0
    print(
        f"game={args.game} best_reward={info.best_reward:.1f}"
        f"±{info.best_reward_std:.1f} epochs={info.epoch} "
        f"env_steps={info.env_step} grad_steps={info.gradient_step} "
        f"wall={dt:.1f}s steps/s={info.env_step / dt:.0f}"
    )
    return info


if __name__ == "__main__":
    main()
