"""Worker process for the 2-process distributed test.

Each process: 4 virtual CPU devices, its own shard of 8 CartPole envs
stepped with a LOCAL jitted rollout, learner data-parallel over the GLOBAL
8-device mesh (gradient all-reduce over Gloo) — the multi-host design of
SURVEY.md §2.4 in miniature.  Prints ``RESULT <loss0> <loss_last> <phash>``
for the parent to compare across processes.

Usage: python tests/_dist_worker.py <process_id> <num_processes> <port>
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

    from tianshou_tpu.parallel.distributed import (
        global_mesh,
        host_shard_pytree,
        init_distributed,
        make_distributed_update,
        process_env_slice,
    )

    assert init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=n_proc,
        process_id=pid,
        local_device_ids=[0, 1, 2, 3],
    )
    assert jax.device_count() == 4 * n_proc
    mesh = global_mesh()

    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.common import QNet

    total_envs = 8
    start, local_envs = process_env_slice(total_envs)
    env = CartPole()
    algo = DQN(
        network=QNet((32, 32), 2), action_space=env.action_space,
        gamma=0.9, n_step=1, target_update_freq=50,
    )
    # local env shard: rollouts jitted on this host's devices only
    collector = Collector(algo, VectorEnv(env, local_envs))
    # identical seed everywhere -> replicated init params
    ts = algo.init(jax.random.key(0), np.zeros(4, np.float32))
    # per-shard distinct env seeds (start offset)
    cstate = collector.reset(jax.random.key(1000 + start))

    update = make_distributed_update(algo, mesh)
    losses = []
    for it in range(20):
        cstate, _, _, traj = collector.collect(
            ts, cstate, None, 8, explore=True, explore_param=0.3,
            record_traj=True,
        )
        # [T, nloc, ...] -> flat local transitions [T*nloc, ...]
        local = jax.tree.map(
            lambda x: np.asarray(x).reshape((-1,) + x.shape[2:]), traj
        )
        transitions = host_shard_pytree(local, mesh)
        ts, metrics = update(ts, transitions, jax.random.key(it))
        losses.append(float(metrics["loss"]))

    # parameter digest must be identical across processes (params are
    # replicated; the gradient all-reduce keeps them in lockstep)
    leaves = jax.tree_util.tree_leaves(ts.params)
    digest = float(sum(np.abs(np.asarray(leaf)).sum() for leaf in leaves))
    print(f"RESULT {losses[0]:.6f} {losses[-1]:.6f} {digest:.6f}", flush=True)


if __name__ == "__main__":
    main()
