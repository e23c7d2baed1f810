"""SAC on BipedalWalker(-Hardcore) via the host-env bridge (analog of
``examples/box2d/bipedal_hardcore_sac.py``).

Reference hyperparameters: hidden 128x128, actor lr 3e-4 / critic 1e-3,
auto-alpha from 0.1, n-step 4, batch 128, buffer 1M, 10 train envs,
``step_per_collect=10`` (one step per env — the fused fine cycle),
``update_per_step=0.1``, 10-episode tests.  ``--hardcore`` additionally
applies the reference's wrapper (action repeat 3, reward x5, terminal
-100 penalty removed) on the TRAIN envs only; test envs keep real
rewards so the curve is comparable to the env's 300-point solved bar.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _HardcoreWrapper:
    """Action-repeat / reward-shaping wrapper from the reference script
    (bipedal_hardcore_sac.py:55-84), gymnasium 5-tuple."""

    def __init__(self, env, action_repeat=3, reward_scale=5, rm_done=True):
        self.env = env
        self.action_repeat = action_repeat
        self.reward_scale = reward_scale
        self.rm_done = rm_done
        self.observation_space = env.observation_space
        self.action_space = env.action_space

    def reset(self, **kw):
        return self.env.reset(**kw)

    def step(self, action):
        rew_sum = 0.0
        for _ in range(self.action_repeat):
            obs, rew, term, trunc, info = self.env.step(action)
            if not (term or trunc) or not self.rm_done:
                rew_sum += float(rew)
            if term or trunc:
                break
        return obs, self.reward_scale * rew_sum, term, trunc, info

    def close(self):
        self.env.close()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hardcore", action="store_true")
    p.add_argument("--platform", default=None)
    p.add_argument("--num-envs", type=int, default=10)
    p.add_argument("--test-envs", type=int, default=10)
    p.add_argument("--max-epoch", type=int, default=100)
    p.add_argument("--step-per-epoch", type=int, default=10000)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--buffer-size", type=int, default=1000000)
    p.add_argument("--start-timesteps", type=int, default=10000)
    p.add_argument("--update-per-step", type=float, default=0.1)
    p.add_argument("--stop-reward", type=float, default=300.0)
    p.add_argument("--no-stop", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--logdir", default=None)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import gymnasium as gym
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tianshou_tpu.algos.sac import SAC
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.host import HostVectorEnv, space_from_gym
    from tianshou_tpu.networks.continuous import CriticEnsemble, GaussianActor
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer
    from tianshou_tpu.utils.logger import TensorboardLogger

    task = "BipedalWalkerHardcore-v3" if args.hardcore else "BipedalWalker-v3"
    if args.hardcore:
        make_train = lambda: _HardcoreWrapper(gym.make(task))
        make_test = lambda: _HardcoreWrapper(
            gym.make(task), reward_scale=1, rm_done=False
        )
    else:
        make_train = make_test = lambda: gym.make(task)
    probe = gym.make(task)
    act_space = space_from_gym(probe.action_space)
    probe.close()

    algo = SAC(
        actor=GaussianActor((128, 128), act_space.shape[0], conditioned_sigma=True),
        critic=CriticEnsemble((128, 128), num_critics=2),
        action_space=act_space,
        actor_lr=3e-4,
        critic_lr=1e-3,
        alpha=0.1,
        alpha_lr=3e-4,
        auto_alpha=True,
        tau=0.005,
        gamma=0.99,
        n_step=4,
    )
    buffer = ReplayBuffer(
        capacity=args.buffer_size // args.num_envs, num_envs=args.num_envs
    )
    train_venv = HostVectorEnv([make_train for _ in range(args.num_envs)])
    test_venv = HostVectorEnv([make_test for _ in range(args.test_envs)])
    logger = TensorboardLogger(
        args.logdir or f"log/sac_{task}_{args.seed}_{int(time.time())}"
    )
    trainer = OffPolicyTrainer(
        algo,
        HostCollector(algo, train_venv, buffer),
        HostCollector(algo, test_venv),
        buffer,
        max_epoch=args.max_epoch,
        step_per_epoch=args.step_per_epoch,
        step_per_collect=args.num_envs,  # 1 step per env -> fused fine cycle
        update_per_step=args.update_per_step,
        batch_size=args.batch_size,
        episode_per_test=args.test_envs,
        warmup_steps=args.start_timesteps,
        stop_fn=None if args.no_stop else (lambda rew: rew >= args.stop_reward),
        seed=args.seed,
        logger=logger,
    )
    t0 = time.time()
    info = trainer.run()
    dt = time.time() - t0
    print(
        f"SAC/{task}: best={info.best_reward:.1f}±{info.best_reward_std:.1f} "
        f"env_steps={info.env_step} wall={dt:.0f}s steps/s={info.env_step/dt:.0f} "
        f"stop={info.stop_triggered}"
    )
    train_venv.close()
    test_venv.close()
    return info


if __name__ == "__main__":
    main()
