"""Worker process for the distributed-TRAINER test: the standard
collect -> local-replay-shard -> presample -> global-mesh update pipeline
(``DistributedOffPolicyTrainer``) training DQN CartPole with REAL n-step=3
chains across 2 processes to a reward threshold.

Usage: python tests/_dist_trainer_worker.py <process_id> <num_processes> <port>
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

    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.distributed import DistributedOffPolicyTrainer

    env = CartPole()
    algo = DQN(
        network=QNet(hidden_sizes=(64, 64), num_actions=2),
        action_space=env.action_space,
        lr=1e-3,
        gamma=0.9,
        n_step=3,  # REAL n-step chains through the local replay shard
        target_update_freq=320,
    )
    local_envs = 8  # 16 global across 2 processes
    buffer = ReplayBuffer(capacity=1000, num_envs=local_envs)
    trainer = DistributedOffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, local_envs), buffer),
        Collector(algo, VectorEnv(env, local_envs)),
        buffer,
        max_epoch=5,
        step_per_epoch=4000,
        step_per_collect=160,
        update_per_step=0.1,
        batch_size=64,  # global; 32 presampled per process
        episode_per_test=5,
        train_param_fn=lambda epoch, step: 0.1,
        test_param=0.0,
        stop_fn=lambda rew: rew >= 170,
        warmup_steps=1000,
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
