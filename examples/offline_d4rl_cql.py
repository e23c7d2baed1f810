"""CQL from a D4RL-format dataset file (analog of
``examples/offline/d4rl_cql.py``): load a qlearning-schema HDF5/npz
(``observations, actions, rewards, terminals, next_observations``
[, ``timeouts``]), optionally standardize observations over the dataset,
train CQL(Lagrange) offline, evaluate on the task env.

D4RL itself (and MuJoCo datasets) are not in this image; any file in the
schema works — ``python -m tests.make_d4rl_demo out.h5`` writes a small
Pendulum demo dataset for a complete end-to-end run.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", help="D4RL qlearning-schema .h5/.npz file")
    p.add_argument("--task", default="Pendulum-v1",
                   help="gymnasium id or JAX env name for evaluation")
    p.add_argument("--platform", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-epoch", type=int, default=20)
    p.add_argument("--update-per-epoch", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--hidden", type=int, nargs="*", default=[256, 256])
    p.add_argument("--actor-lr", type=float, default=1e-4)
    p.add_argument("--critic-lr", type=float, default=3e-4)
    p.add_argument("--cql-weight", type=float, default=1.0)
    p.add_argument("--no-lagrange", action="store_true")
    p.add_argument("--calibrated", action="store_true", help="CalQL")
    p.add_argument("--normalize-obs", action="store_true")
    p.add_argument("--test-envs", type=int, default=4)
    p.add_argument("--logdir", default=None)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tianshou_tpu.algos.offline import CQL
    from tianshou_tpu.data.persistence import (
        buffer_from_d4rl,
        normalize_obs_in_buffer,
    )
    from tianshou_tpu.networks.continuous import CriticEnsemble, GaussianActor
    from tianshou_tpu.trainer.offline import OfflineTrainer
    from tianshou_tpu.utils.logger import TensorboardLogger

    buffer, bstate = buffer_from_d4rl(args.dataset)
    if args.normalize_obs:
        bstate, mean, std = normalize_obs_in_buffer(bstate)

    # evaluation env: JAX-native name first, gymnasium fallback
    try:
        from tianshou_tpu.collect.collector import Collector
        from tianshou_tpu.envs import make_env
        from tianshou_tpu.envs.base import VectorEnv

        env = make_env(args.task)
        test_collector = Collector(None, VectorEnv(env, args.test_envs))
        act_space = env.action_space
    except Exception:
        import gymnasium as gym

        from tianshou_tpu.collect.host_collector import HostCollector
        from tianshou_tpu.envs.host import HostVectorEnv, space_from_gym

        make = lambda: gym.make(args.task)
        venv = HostVectorEnv([make for _ in range(args.test_envs)])
        act_space = space_from_gym(venv.action_space)
        test_collector = HostCollector(None, venv)

    act_dim = act_space.shape[0]
    algo = CQL(
        actor=GaussianActor(tuple(args.hidden), act_dim, conditioned_sigma=True),
        critic=CriticEnsemble(tuple(args.hidden), num_critics=2),
        action_space=act_space,
        actor_lr=args.actor_lr,
        critic_lr=args.critic_lr,
        cql_weight=args.cql_weight,
        with_lagrange=not args.no_lagrange,
        calibrated=args.calibrated,
    )
    test_collector.algo = algo
    logger = TensorboardLogger(
        args.logdir or f"log/cql_d4rl_{args.task}_{args.seed}_{int(time.time())}"
    )
    trainer = OfflineTrainer(
        algo, buffer, bstate, test_collector,
        max_epoch=args.max_epoch,
        update_per_epoch=args.update_per_epoch,
        batch_size=args.batch_size,
        episode_per_test=args.test_envs,
        logger=logger,
        seed=args.seed,
    )
    t0 = time.time()
    info = trainer.run()
    print(
        f"CQL/{args.task} from {os.path.basename(args.dataset)}: "
        f"best={info.best_reward:.1f}±{info.best_reward_std:.1f} "
        f"grad_steps={info.gradient_step} wall={time.time() - t0:.0f}s"
    )
    return info


if __name__ == "__main__":
    main()
