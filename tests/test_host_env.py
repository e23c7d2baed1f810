"""Host gymnasium bridge tests: venv semantics + DQN training through the
host collector (the analog of the reference's subproc-venv collector tests)."""

import jax
import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from tianshou_tpu.algos.dqn import DQN
from tianshou_tpu.collect.host_collector import HostCollector
from tianshou_tpu.data.buffer import ReplayBuffer
from tianshou_tpu.envs.host import HostVectorEnv, NormObsHostVectorEnv, space_from_gym
from tianshou_tpu.envs.spaces import Discrete
from tianshou_tpu.networks.common import QNet
from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer


def _make():
    return gym.make("CartPole-v1")


def test_host_venv_step_and_autoreset():
    venv = HostVectorEnv([_make for _ in range(4)])
    assert venv.num_envs == 4
    assert isinstance(venv.action_space, Discrete)
    obs = venv.reset(seed=0)
    assert obs.shape == (4, 4)
    done_seen = False
    for _ in range(300):
        res, carry = venv.step(np.ones(4, np.int64))
        done = res.terminated | res.truncated
        if done.any():
            done_seen = True
            j = int(np.nonzero(done)[0][0])
            # carry obs is a reset obs (tight init bounds)
            assert np.all(np.abs(carry[j]) <= 0.05 + 1e-6)
            break
    assert done_seen
    venv.close()


def test_host_norm_obs_env():
    venv = NormObsHostVectorEnv([_make for _ in range(4)])
    obs = venv.reset(seed=0)
    for _ in range(20):
        res, carry = venv.step(np.random.randint(0, 2, size=4))
    assert venv.rms.count > 50
    venv2 = NormObsHostVectorEnv([_make for _ in range(2)], update_rms=False)
    venv2.set_rms(venv.get_rms())
    assert venv2.rms.count == venv.rms.count
    venv.close()
    venv2.close()


def test_host_collector_act_on_host_keeps_buffer_on_default_device():
    """Regression: with act_on_host the act/policy leaves come back
    COMMITTED to the host CPU device; the buffer write must re-commit them
    to the default device or the storage leaves silently migrate and the
    jitted trainer update later fails with mixed devices.  Emulated here
    with two virtual CPU devices (cpu:1 plays the host, cpu:0 the chip)."""
    algo = DQN(
        network=QNet((32,), 2),
        action_space=Discrete(2),
        gamma=0.9,
        n_step=1,
        target_update_freq=10,
    )
    buffer = ReplayBuffer(capacity=64, num_envs=2)
    venv = HostVectorEnv([_make for _ in range(2)])
    col = HostCollector(algo, venv, buffer, act_on_host=True)
    col._cpu = jax.devices()[1]  # a *different* device than the default
    col.act_on_host = True
    col.reset(seed=0)
    key = jax.random.key(0)
    ts = algo.init(key, jax.numpy.asarray(col.obs[0]))
    _, _, traj = col.collect(ts, None, 1, key, record_traj=True)
    example = jax.tree.map(lambda x: jax.numpy.asarray(x)[0, 0], traj)
    bstate = buffer.init(example)
    bstate, _, _ = col.collect(ts, bstate, 4, key)
    default = jax.devices()[0]
    for path, leaf in jax.tree_util.tree_leaves_with_path(bstate):
        assert leaf.devices() == {default}, (
            f"{jax.tree_util.keystr(path)} on {leaf.devices()}"
        )
    venv.close()


def test_host_dqn_cartpole_learns():
    env = _make()
    algo = DQN(
        network=QNet((128, 128, 128), 2),
        action_space=Discrete(2),
        gamma=0.9,
        n_step=3,
        target_update_freq=320,
    )
    buffer = ReplayBuffer(capacity=2000, num_envs=8)
    train_venv = HostVectorEnv([_make for _ in range(8)])
    test_venv = HostVectorEnv([_make for _ in range(8)])
    trainer = OffPolicyTrainer(
        algo,
        HostCollector(algo, train_venv, buffer),
        HostCollector(algo, test_venv),
        buffer,
        max_epoch=4,
        step_per_epoch=10000,
        step_per_collect=80,
        update_per_step=0.1,
        batch_size=64,
        train_param_fn=lambda e, s: 0.1,
        stop_fn=lambda rew: rew >= 195,
        warmup_steps=1000,
        seed=0,
    )
    info = trainer.run()
    train_venv.close()
    test_venv.close()
    assert info.stop_triggered, f"best={info.best_reward}"


def test_host_collect_random_uniform_warmup():
    """collect(random=True): actions are sampled UNIFORMLY from the action
    space, bypassing the policy (the reference's random warm-up) — raw
    actions span [-1,1] for Box even though the untrained actor wouldn't,
    and env actions are the affine map of the raw ones."""
    import gymnasium as gym

    from tianshou_tpu.algos.ddpg import DDPG
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.networks.continuous import CriticEnsemble, DeterministicActor

    make = lambda: gym.make("Pendulum-v1")
    venv = HostVectorEnv([make for _ in range(4)])
    act_space = space_from_gym(venv.action_space)
    algo = DDPG(
        DeterministicActor((16,), 1),
        CriticEnsemble((16,), num_critics=1),
        act_space,
    )
    buffer = ReplayBuffer(capacity=128, num_envs=4)
    col = HostCollector(algo, venv, buffer)
    col.reset(seed=0)
    ts = algo.init(jax.random.key(0), jax.numpy.asarray(col.obs[0]))
    _, _, traj = col.collect(
        ts, None, 1, jax.random.key(1), record_traj=True
    )
    example = jax.tree.map(lambda x: jax.numpy.asarray(x)[0, 0], traj)
    bstate = buffer.init(example)
    bstate, stats, traj = col.collect(
        ts, bstate, 60, jax.random.key(2), random=True, record_traj=True
    )
    acts = np.asarray(traj["act"]).reshape(-1)
    # uniform over [-1, 1]: full span and roughly uniform quartiles
    assert acts.min() < -0.8 and acts.max() > 0.8
    hist, _ = np.histogram(acts, bins=4, range=(-1, 1))
    assert (hist > len(acts) * 0.1).all(), hist
    venv.close()
