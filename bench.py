"""Headline benchmark: fused DQN training pipeline throughput on CartPole.

Measures env-steps/s of the COMPLETE off-policy pipeline — jitted collector
(1024 on-device CartPole instances in lockstep) + ring-buffer writes +
n-step-target DQN updates at the reference's samples-per-env-step training
ratio (update_per_step=0.1 x batch 64 == 6.4 sampled transitions per env
step, here served as batch-1024 updates).

Baseline: the reference (Tianshou v1.0.0) publishes no env-steps/s tables
(BASELINE.md); its CartPole DQN test config (test/discrete/test_dqn.py:
10 subprocess envs + CPU/GPU learner) sustains on the order of 1.5k
env-steps/s end to end.  vs_baseline is measured against that estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

BASELINE_STEPS_PER_SEC = 1500.0

NUM_ENVS = 1024
SEGMENT_LEN = 64  # steps per env per superstep
BATCH_SIZE = 1024
# reference ratio: 6.4 sampled transitions per env step
UPDATES_PER_SEGMENT = max(1, round(6.4 * NUM_ENVS * SEGMENT_LEN / BATCH_SIZE))


def main():
    import jax

    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    env = CartPole()
    venv = VectorEnv(env, NUM_ENVS)
    algo = DQN(
        network=QNet(hidden_sizes=(128, 128, 128), num_actions=2),
        action_space=env.action_space,
        lr=1e-3,
        gamma=0.9,
        n_step=3,
        target_update_freq=320,
    )
    buffer = ReplayBuffer(capacity=64, num_envs=NUM_ENVS)  # 65k transitions
    collector = Collector(algo, venv, buffer)
    trainer = OffPolicyTrainer(
        algo,
        collector,
        collector,
        buffer,
        max_epoch=1,
        step_per_epoch=1,
        step_per_collect=NUM_ENVS * SEGMENT_LEN,
        update_per_step=UPDATES_PER_SEGMENT / (NUM_ENVS * SEGMENT_LEN),
        batch_size=BATCH_SIZE,
    )

    key = jax.random.key(0)
    cstate = collector.reset(key)
    ts = algo.init(jax.random.key(1), jax.tree.map(lambda x: x[0], cstate.obs))
    bstate = buffer.init(collector.example_transition(ts, cstate))
    superstep = trainer._build_superstep()

    # warmup: compile + fill buffer.  NOTE: fetch a concrete value to force
    # execution — on the axon platform block_until_ready can return before
    # the computation actually finishes.
    for i in range(2):
        ts, cstate, bstate, outputs, metrics = superstep(
            ts, cstate, bstate, jax.random.key(10 + i), 0.1
        )
    float(metrics["loss"])

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        ts, cstate, bstate, outputs, metrics = superstep(
            ts, cstate, bstate, jax.random.key(100 + i), 0.1
        )
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    steps = n_iters * NUM_ENVS * SEGMENT_LEN
    sps = steps / dt
    print(
        json.dumps(
            {
                "metric": "dqn_cartpole_pipeline_env_steps_per_sec",
                "value": round(sps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
