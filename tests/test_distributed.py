"""Multi-PROCESS distributed training correctness (SURVEY.md §2.4).

Launches 2 real OS processes x 4 virtual CPU devices each, joined into one
``jax.distributed`` runtime (Gloo collectives): every process steps its own
shard of the env fleet with a local jitted rollout and runs the learner
data-parallel over the GLOBAL 8-device mesh — the CI analog of a 2-host TPU
pod slice (the reference has no multi-node test infra at all; its
distribution is exercised in-process, SURVEY.md §4.7 — this goes further).
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_dist_worker.py")
TRAINER_WORKER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "_dist_trainer_worker.py"
)
ONPOLICY_WORKER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "_dist_onpolicy_worker.py"
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_training():
    port = _free_port()
    env = dict(os.environ)
    # the workers configure their own device counts/platform
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-2000:]

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, out[-2000:]
        _, loss0, loss_last, digest = lines[0].split()
        results.append((float(loss0), float(loss_last), float(digest)))

    # the gradient all-reduce keeps replicated params in lockstep: both
    # processes must observe IDENTICAL losses and end with IDENTICAL params
    assert results[0] == results[1], results
    # and training across the global batch actually learns
    assert results[0][1] < results[0][0], results[0]


def test_two_process_distributed_trainer_reaches_threshold():
    """The REAL training architecture across processes
    (``DistributedOffPolicyTrainer``): each process runs the standard
    collect -> local replay shard -> n-step presample pipeline, the
    learner is one global-mesh data-parallel ``update_sampled`` per
    gradient step, and DQN CartPole with n_step=3 reaches the reward
    threshold with parameters in cross-process lockstep."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, TRAINER_WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-2000:]

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, out[-2000:]
        _, stopped, best, env_step, digest = lines[0].split()
        results.append((int(stopped), float(best), int(env_step), float(digest)))

    # lockstep: identical stop decision, env-step count and parameters
    assert results[0] == results[1], results
    stopped, best, _, _ = results[0]
    assert stopped == 1 and best >= 170, results[0]


def test_two_process_distributed_onpolicy_trainer_reaches_threshold():
    """The on-policy pod path (``DistributedOnPolicyTrainer``): per-process
    env-shard rollouts assembled into one dp-sharded global trajectory,
    GAE + repeat x minibatch PPO jitted over the global mesh.  PPO
    CartPole reaches threshold with parameters in cross-process
    lockstep."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, ONPOLICY_WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-2000:]

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, out[-2000:]
        _, stopped, best, env_step, digest = lines[0].split()
        results.append((int(stopped), float(best), int(env_step), float(digest)))

    assert results[0] == results[1], results
    stopped, best, _, _ = results[0]
    assert stopped == 1 and best >= 195, results[0]


def test_distributed_onpolicy_trainer_single_process_learns_cartpole():
    """The distributed on-policy trainer IS a correct trainer at
    process_count=1 (8-device mesh): PPO CartPole to threshold through the
    global-mesh GAE + minibatch program."""
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
    trainer = DistributedOnPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 16)),
        Collector(algo, VectorEnv(env, 16)),
        max_epoch=8,
        step_per_epoch=30000,
        step_per_collect=2048,
        repeat_per_collect=10,
        batch_size=256,
        episode_per_test=10,
        stop_fn=lambda rew: rew >= 195,
        seed=0,
    )
    info = trainer.run()
    assert info.stop_triggered, f"best={info.best_reward}"


def test_distributed_trainer_per_writeback_single_process():
    """PER through the distributed trainer (process_count=1, 8-device
    mesh): sampling uses real IS weights and priorities are written back
    process-locally from priority_scores (pre-update |TD|), so the
    sum-tree actually departs from its init value."""
    import jax
    import numpy as np

    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.prio import PrioritizedReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.distributed import DistributedOffPolicyTrainer

    env = CartPole()
    algo = DQN(
        network=QNet(hidden_sizes=(32, 32), num_actions=2),
        action_space=env.action_space,
        lr=1e-3, gamma=0.9, n_step=3, target_update_freq=100,
    )
    buffer = PrioritizedReplayBuffer(capacity=200, num_envs=4, alpha=0.6, beta=0.4)
    trainer = DistributedOffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 4), buffer),
        Collector(algo, VectorEnv(env, 4)),
        buffer,
        max_epoch=1,
        step_per_epoch=64,
        step_per_collect=16,
        update_per_step=0.25,
        batch_size=16,
        episode_per_test=2,
        warmup_steps=64,
        seed=0,
    )
    info = trainer.run()
    assert info.gradient_step >= 4
    # PER tree priorities must have moved off the uniform init
    tree = np.asarray(trainer.buffer_state.tree)
    pow2 = 1 << (200 * 4 - 1).bit_length()
    leaves = tree[pow2 : pow2 + 200 * 4]
    filled = leaves[leaves > 0]
    assert filled.size > 0 and float(filled.std()) > 1e-6


def test_distributed_trainer_single_process_learns_cartpole():
    """The distributed trainer IS a correct trainer at process_count=1:
    DQN with n_step=3 through collect -> local replay -> presample ->
    8-device-mesh global update learns CartPole to threshold (the
    in-process analog of the 2-process run, cheap enough for every CI
    pass)."""
    import jax

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
        lr=1e-3, gamma=0.9, n_step=3, target_update_freq=320,
    )
    buffer = ReplayBuffer(capacity=1000, num_envs=8)
    trainer = DistributedOffPolicyTrainer(
        algo,
        Collector(algo, VectorEnv(env, 8), buffer),
        Collector(algo, VectorEnv(env, 8)),
        buffer,
        max_epoch=4,
        step_per_epoch=4000,
        step_per_collect=80,
        update_per_step=0.1,
        batch_size=64,
        episode_per_test=5,
        train_param_fn=lambda epoch, step: 0.1,
        stop_fn=lambda rew: rew >= 170,
        warmup_steps=1000,
        seed=0,
    )
    info = trainer.run()
    assert info.stop_triggered and info.best_reward >= 170, info.best_reward


def test_distributed_per_priority_scores_distributional():
    """priority_scores for the distributional family: C51 recomputes its
    cross-entropy priority, QRDQN its quantile |TD| (matching what their
    update_sampled writes back); IQN/FQF decline loudly instead of
    inheriting a wrong quantity."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tianshou_tpu.algos.c51 import C51
    from tianshou_tpu.algos.qrdqn import FQF, IQN, QRDQN
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.networks.discrete import C51Net, QRDQNNet

    env = CartPole()

    def filled(algo):
        buf = ReplayBuffer(capacity=64, num_envs=4)
        col = Collector(algo, VectorEnv(env, 4), buf)
        cstate = col.reset(jax.random.key(0))
        ts = algo.init(jax.random.key(1), jax.tree.map(lambda x: x[0], cstate.obs))
        bst = buf.init(col.example_transition(ts, cstate))
        _, bst, _, _ = col.collect(ts, cstate, bst, 16)
        return buf, bst, ts

    c51 = C51(C51Net((32,), 2, num_atoms=17), env.action_space,
              num_atoms=17, n_step=2)
    buf, bst, ts = filled(c51)
    sampled = c51.presample(buf, bst, jax.random.key(2), 8)
    scores = c51.priority_scores(ts, sampled)
    assert scores.shape == (8,) and bool(jnp.all(scores >= 0))
    # cross-entropy against the projected target, NOT a q-space |TD|:
    # must match update_sampled's write-back quantity for non-noisy nets
    from tianshou_tpu.data.prio import PrioritizedReplayBuffer

    pbuf = PrioritizedReplayBuffer(capacity=64, num_envs=4)
    pbst = pbuf.init(jax.tree.map(lambda x: x, sampled[3]))  # schema only

    qr = QRDQN(QRDQNNet((32,), 2, num_quantiles=8), env.action_space,
               num_quantiles=8, n_step=2)
    buf, bst, ts = filled(qr)
    sampled = qr.presample(buf, bst, jax.random.key(3), 8)
    scores = qr.priority_scores(ts, sampled)
    assert scores.shape == (8,) and bool(jnp.all(scores >= 0))

    from tianshou_tpu.networks.discrete import ImplicitQuantileNetwork

    iqn = IQN(ImplicitQuantileNetwork((32,), 2), env.action_space, n_step=2)
    buf, bst, ts = filled(iqn)
    sampled = iqn.presample(buf, bst, jax.random.key(4), 8)
    scores = iqn.priority_scores(ts, sampled, jax.random.key(5))
    assert scores.shape == (8,) and bool(jnp.all(scores >= 0))


def test_iqn_fqf_priority_scores_shard_exact():
    """The distributed-PER contract for the quantile family: recomputing
    priorities shard-by-shard (each shard at its global ``row_offset``)
    reproduces BIT-EXACTLY the |TD| the full-batch ``update_sampled``
    wrote into the PER tree.  IQN's fractions are per-global-row
    (``_rowwise_taus``); FQF's are deterministic proposals."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tianshou_tpu.algos.qrdqn import FQF, IQN
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.prio import PrioritizedReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import CartPole
    from tianshou_tpu.networks.discrete import (
        FractionProposalNetwork,
        FullQuantileFunction,
        ImplicitQuantileNetwork,
    )

    env = CartPole()
    algos = [
        IQN(ImplicitQuantileNetwork((32,), 2), env.action_space, n_step=2),
        FQF(
            FullQuantileFunction((32,), 2),
            FractionProposalNetwork(num_fractions=8),
            env.action_space,
            num_fractions=8,
            n_step=2,
        ),
    ]
    for algo in algos:
        cap = 64
        buf = PrioritizedReplayBuffer(capacity=cap, num_envs=2, alpha=0.6)
        col = Collector(algo, VectorEnv(env, 2), buf)
        cstate = col.reset(jax.random.key(0))
        ts = algo.init(
            jax.random.key(1), jax.tree.map(lambda x: x[0], cstate.obs)
        )
        bst = buf.init(col.example_transition(ts, cstate))
        _, bst, _, _ = col.collect(ts, cstate, bst, 20)

        k_s, k_u = jax.random.split(jax.random.key(9))
        B = 16
        sampled = algo.presample(buf, bst, k_s, B)
        env_idx, pos = sampled[0], sampled[1]
        _, bst2, _ = algo.update_sampled(ts, buf, bst, sampled, k_u)

        # shard recompute: two halves at their global row offsets
        half = B // 2
        shards = [
            jax.tree.map(lambda x: x[p * half : (p + 1) * half], sampled)
            for p in range(2)
        ]
        scores = jnp.concatenate(
            [
                algo.priority_scores(ts, shards[p], k_u, row_offset=p * half)
                for p in range(2)
            ]
        )
        # must equal the tree's written priorities at unique slots
        flat = np.asarray(env_idx) * cap + np.asarray(pos)
        pow2 = 1 << (cap * 2 - 1).bit_length()
        tree = np.asarray(bst2.tree)
        written, expected = [], []
        for i in range(B):
            if list(flat).count(flat[i]) == 1:
                written.append(tree[pow2 + flat[i]])
                expected.append((float(scores[i]) + 1e-6) ** 0.6)
        assert len(written) >= 8
        np.testing.assert_allclose(
            np.asarray(written), np.asarray(expected), rtol=1e-6,
            err_msg=type(algo).__name__,
        )


def test_priority_scores_exact_for_sampling_targets():
    """For algorithms whose targets SAMPLE (SAC next-actions), passing the
    update's key into priority_scores reproduces BIT-EXACTLY the priority
    update_sampled writes into its own PER tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tianshou_tpu.algos.sac import SAC
    from tianshou_tpu.collect.collector import Collector
    from tianshou_tpu.data.prio import PrioritizedReplayBuffer
    from tianshou_tpu.envs.base import VectorEnv
    from tianshou_tpu.envs.classic import Pendulum
    from tianshou_tpu.networks.continuous import CriticEnsemble, GaussianActor

    env = Pendulum()
    sac = SAC(
        actor=GaussianActor((16, 16), 1, conditioned_sigma=True),
        critic=CriticEnsemble((16, 16), num_critics=2),
        action_space=env.action_space,
    )
    buf = PrioritizedReplayBuffer(capacity=64, num_envs=2, alpha=0.7)
    col = Collector(sac, VectorEnv(env, 2), buf)
    cstate = col.reset(jax.random.key(0))
    ts = sac.init(jax.random.key(1), jax.tree.map(lambda x: x[0], cstate.obs))
    bst = buf.init(col.example_transition(ts, cstate))
    _, bst, _, _ = col.collect(ts, cstate, bst, 20)

    k_s, k_u = jax.random.split(jax.random.key(9))
    sampled = sac.presample(buf, bst, k_s, 16)
    env_idx, pos = sampled[0], sampled[1]
    _, bst2, _ = sac.update_sampled(ts, buf, bst, sampled, k_u)
    scores = sac.priority_scores(ts, sampled, k_u)

    # compare at slots whose LAST write is unambiguous (unique indices)
    flat = np.asarray(env_idx) * 64 + np.asarray(pos)
    pow2 = 1 << (64 * 2 - 1).bit_length()
    tree = np.asarray(bst2.tree)
    vals, seen = [], set()
    expected = []
    for i in range(len(flat)):
        if list(flat).count(flat[i]) == 1:
            vals.append(tree[pow2 + flat[i]])
            expected.append(float(scores[i]) ** 0.7)
    assert len(vals) >= 8
    np.testing.assert_allclose(np.asarray(vals), np.asarray(expected), rtol=1e-5)
