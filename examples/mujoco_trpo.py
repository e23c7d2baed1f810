"""TRPO / NPG on MuJoCo via the host-env bridge (analogs of
``examples/mujoco/mujoco_trpo.py`` and ``mujoco_npg.py``; BASELINE.md
on-policy rows — TRPO HalfCheetah 4471.2±804.9 @1M, NPG 3485.2±716.6).

Reference hyperparameters (both scripts share them): hidden 64x64,
critic lr 1e-3 with linear decay, gamma 0.99, GAE 0.95, 16 train envs,
1024 steps per collect, repeat 1, single full-batch natural-gradient
update per collect (``batch-size None``), advantage normalization ON,
return normalization ON, 20 critic regression iters; TRPO adds
max-kl 0.01 / backtrack 0.8 / 10 backtracks, NPG a 0.1 actor step size.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--algo", default="trpo", choices=("trpo", "npg"))
    p.add_argument("--task", default="HalfCheetah-v4")
    p.add_argument("--platform", default=None)
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--test-envs", type=int, default=10)  # reference test_num=10
    p.add_argument("--max-epoch", type=int, default=100)
    p.add_argument("--step-per-epoch", type=int, default=10000)
    p.add_argument("--step-per-collect", type=int, default=1024)
    p.add_argument("--critic-lr", type=float, default=1e-3)
    p.add_argument("--optim-critic-iters", type=int, default=20)
    p.add_argument("--actor-step-size", type=float, default=0.1)
    p.add_argument("--max-kl", type=float, default=0.01)
    p.add_argument("--backtrack-coeff", type=float, default=0.8)
    p.add_argument("--max-backtracks", type=int, default=10)
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

    from tianshou_tpu.algos.npg import NPG, TRPO
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.envs.host import NormObsHostVectorEnv, space_from_gym
    from tianshou_tpu.networks.continuous import GaussianActor, ValueNet
    from tianshou_tpu.trainer.onpolicy import OnPolicyTrainer
    from tianshou_tpu.utils.logger import TensorboardLogger

    make = lambda: gym.make(args.task)
    probe = make()
    act_space = space_from_gym(probe.action_space)
    probe.close()

    # critic lr decays linearly to zero over every critic regression step
    # (reference LambdaLR over update rounds, mujoco_trpo.py lr-decay)
    rounds = args.max_epoch * -(-args.step_per_epoch // args.step_per_collect)
    tx = None
    if not args.no_lr_decay:
        tx = optax.adam(
            optax.linear_schedule(
                args.critic_lr, 0.0, rounds * args.optim_critic_iters
            )
        )
    common = dict(
        action_space=act_space,
        critic_lr=args.critic_lr,
        gamma=0.99,
        gae_lambda=0.95,
        optim_critic_iters=args.optim_critic_iters,
        adv_norm=True,
        ret_norm=True,
    )
    actor = GaussianActor((64, 64), act_space.shape[0], sigma_init=-0.5)
    critic = ValueNet((64, 64))
    if args.algo == "trpo":
        algo = TRPO(
            actor, critic,
            max_kl=args.max_kl,
            backtrack_coeff=args.backtrack_coeff,
            max_backtracks=args.max_backtracks,
            **common,
        )
    else:
        algo = NPG(
            actor, critic,
            trust_region_size=args.actor_step_size,
            **common,
        )
    if tx is not None:
        algo.optimizer = tx

    train_venv = NormObsHostVectorEnv([make for _ in range(args.num_envs)])
    test_venv = NormObsHostVectorEnv(
        [make for _ in range(args.test_envs)], update_rms=False
    )
    test_venv.set_rms(train_venv.get_rms())
    logger = TensorboardLogger(
        args.logdir or f"log/{args.algo}_{args.task}_{args.seed}_{int(time.time())}"
    )
    trainer = OnPolicyTrainer(
        algo,
        HostCollector(algo, train_venv),
        HostCollector(algo, test_venv),
        max_epoch=args.max_epoch,
        step_per_epoch=args.step_per_epoch,
        step_per_collect=args.step_per_collect,
        repeat_per_collect=1,
        batch_size=1 << 30,  # whole collect in ONE natural-gradient update
        episode_per_test=args.test_envs,
        seed=args.seed,
        logger=logger,
    )
    t0 = time.time()
    info = trainer.run()
    dt = time.time() - t0
    print(
        f"{args.algo.upper()}/{args.task}: "
        f"best={info.best_reward:.1f}±{info.best_reward_std:.1f} "
        f"env_steps={info.env_step} wall={dt:.0f}s steps/s={info.env_step/dt:.0f}"
    )
    train_venv.close()
    test_venv.close()
    return info


if __name__ == "__main__":
    main()
