"""Write a small D4RL-qlearning-schema dataset for the offline example.

``python -m tests.make_d4rl_demo out.h5 [--steps 4000]`` rolls a random
policy through the JAX Pendulum env and stores transitions under the
standard D4RL keys (``observations, actions, rewards, terminals,
next_observations, timeouts``) — enough to exercise
``examples/offline_d4rl_cql.py`` end to end without d4rl itself.
"""

import argparse
import sys

import h5py
import numpy as np


def generate(steps: int = 4000, seed: int = 0) -> dict:
    import jax

    from tianshou_tpu.algos.base import RandomPolicy
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import Pendulum

    env = Pendulum()
    n_envs = 8
    algo = RandomPolicy(env.action_space)
    col = Collector(algo, VectorEnv(env, n_envs))
    cstate = col.reset(jax.random.key(seed))
    ts = algo.init(jax.random.key(seed + 1), None)
    cstate, _, _, traj = col.collect(
        ts, cstate, None, max(1, steps // n_envs), explore=True,
        record_traj=True,
    )
    # [T, N, ...] -> [N, T, ...] -> flat: keep each env's episodes
    # CONTIGUOUS (a plain [T, N] reshape would interleave envs and break
    # the terminals-delimit-episodes invariant n-step/CalQL rely on)
    flat = {
        k: np.asarray(traj[k])
        .swapaxes(0, 1)
        .reshape((-1,) + tuple(traj[k].shape[2:]))
        for k in ("obs", "act", "rew", "terminated", "truncated", "obs_next")
    }
    # env boundaries are episode boundaries too: the last transition of
    # each env's block ends its (possibly unfinished) episode
    n_steps = np.asarray(traj["rew"]).shape[0]
    block_ends = np.arange(1, n_envs + 1) * n_steps - 1
    flat["truncated"] = flat["truncated"].copy()
    flat["truncated"][block_ends] |= ~flat["terminated"][block_ends]
    return {
        "observations": flat["obs"].astype(np.float32),
        "actions": flat["act"].astype(np.float32),
        "rewards": flat["rew"].astype(np.float32),
        "terminals": flat["terminated"].astype(bool),
        "timeouts": flat["truncated"].astype(bool),
        "next_observations": flat["obs_next"].astype(np.float32),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    data = generate(args.steps, args.seed)
    if args.out.endswith(".npz"):
        np.savez(args.out, **data)
    else:
        with h5py.File(args.out, "w") as f:
            for k, v in data.items():
                f.create_dataset(k, data=v)
    print(f"wrote {args.out}: {len(data['observations'])} transitions")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
