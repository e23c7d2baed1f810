"""Worker process for the distributed ON-POLICY trainer test: each process
rolls out its own env shard, the rollouts assemble into one dp-sharded
global trajectory, and the GAE + repeat x minibatch PPO program runs over
the global mesh (``DistributedOnPolicyTrainer``) to a reward threshold.

Usage: python tests/_dist_onpolicy_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    import numpy as np

    from tianshou_tpu.parallel.distributed import init_distributed

    assert init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=n_proc,
        process_id=pid,
        local_device_ids=[0, 1, 2, 3],
    )
    assert jax.device_count() == 4 * n_proc

    from tianshou_tpu.algos.ppo import PPO
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.networks.continuous import ValueNet
    from tianshou_tpu.trainer.distributed import DistributedOnPolicyTrainer

    env = CartPole()
    algo = PPO(
        QNet((64, 64), 2),
        ValueNet((64, 64)),
        env.action_space,
        lr=3e-4,
        gamma=0.99,
        gae_lambda=0.95,
        max_grad_norm=0.5,
        ent_coef=0.0,
    )
    local_envs = 8  # 16 global across 2 processes
    trainer = DistributedOnPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, local_envs)),
        Collector(algo, VectorEnv(env, local_envs)),
        max_epoch=8,
        step_per_epoch=30000,
        step_per_collect=2048,  # global
        repeat_per_collect=10,
        batch_size=256,  # global minibatch
        episode_per_test=10,
        stop_fn=lambda rew: rew >= 195,
        seed=0,
    )
    info = trainer.run()

    leaves = jax.tree_util.tree_leaves(trainer.train_state.params)
    digest = float(sum(np.abs(np.asarray(leaf)).sum() for leaf in leaves))
    print(
        f"RESULT {int(info.stop_triggered)} {info.best_reward:.2f} "
        f"{info.env_step} {digest:.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
