"""Remote env farms (tianshou_tpu/envs/remote.py): the cluster-elastic env
worker story — env fleets on machines outside the jax mesh, driven over
TCP (counterpart of the reference's Ray workers, env/worker/ray.py)."""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_farm(env_id: str, num_envs: int, port: int) -> subprocess.Popen:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen(
        [
            sys.executable, "-m", "tianshou_tpu.envs.remote",
            "--env", env_id, "--num-envs", str(num_envs),
            "--port", str(port), "--host", "127.0.0.1",
        ],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )


def _connect(addresses, timeout=30.0):
    from tianshou_tpu.envs.remote import RemoteVectorEnv

    deadline = time.time() + timeout
    while True:
        try:
            return RemoteVectorEnv(addresses)
        except (ConnectionError, OSError):
            if time.time() > deadline:
                raise
            time.sleep(0.3)


@pytest.fixture
def two_farms():
    ports = [_free_port(), _free_port()]
    procs = [_spawn_farm("CartPole-v1", 4, p) for p in ports]
    yield [f"127.0.0.1:{p}" for p in ports]
    for p in procs:
        p.kill()
        p.wait()


def test_remote_venv_semantics(two_farms):
    venv = _connect(two_farms)
    assert venv.num_envs == 8
    obs = venv.reset(seed=0)
    assert obs.shape == (8, 4) and obs.dtype == np.float32
    rng = np.random.default_rng(0)
    saw_done = False
    for _ in range(250):
        acts = rng.integers(0, 2, size=8).astype(np.int32)
        res, carry = venv.step(acts)
        assert res.obs.shape == (8, 4) and carry.shape == (8, 4)
        assert res.reward.shape == (8,)
        done = res.terminated | res.truncated
        # autoreset: where done, the carry obs is a FRESH episode's reset
        # obs (CartPole reset state is near zero), while res.obs keeps the
        # terminal observation
        for i in np.nonzero(done)[0]:
            saw_done = True
            assert np.abs(carry[i]).max() < 0.06
        for i in np.nonzero(~done)[0]:
            np.testing.assert_allclose(carry[i], res.obs[i])
    assert saw_done  # random CartPole must terminate within 250 steps
    venv.close()


def test_remote_env_factory(two_farms):
    """highlevel RemoteEnvFactory builds Environments from farm addresses."""
    from tianshou_tpu.highlevel.env import RemoteEnvFactory

    # connect with retry first so the factory call below can't race the
    # farm startup (also exercises farm survival across a client close)
    _connect(two_farms).close()
    # a farm serves one learner connection at a time: train on farm 0,
    # test on farm 1
    fac = RemoteEnvFactory(two_farms[:1], two_farms[1:])
    envs = fac.create_envs(4, 4)
    assert envs.train_venv.num_envs == 4
    assert envs.test_venv.num_envs == 4
    assert envs.backend == "host"
    obs = envs.train_venv.reset(seed=0)
    assert obs.shape == (4, 4)
    envs.train_venv.close()
    envs.test_venv.close()


def test_remote_dqn_cartpole_learns(two_farms):
    """Train DQN to threshold with ALL env stepping on remote farms —
    the collector/trainer stack is unchanged (RemoteVectorEnv presents the
    host-venv surface)."""
    from tianshou_tpu.algos.dqn import DQN
    from tianshou_tpu.collect.host_collector import HostCollector
    from tianshou_tpu.data.buffer import ReplayBuffer
    from tianshou_tpu.envs.spaces import Discrete
    from tianshou_tpu.networks.common import QNet
    from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer

    venv = _connect(two_farms)
    import gymnasium as gym

    test_venv_local = None
    from tianshou_tpu.envs.host import HostVectorEnv

    test_venv_local = HostVectorEnv(
        [lambda: gym.make("CartPole-v1") for _ in range(8)]
    )
    algo = DQN(
        network=QNet((128, 128, 128), 2),
        action_space=Discrete(2),
        gamma=0.9,
        n_step=3,
        target_update_freq=320,
    )
    buffer = ReplayBuffer(capacity=2000, num_envs=venv.num_envs)
    trainer = OffPolicyTrainer(
        algo,
        HostCollector(algo, venv, buffer),
        HostCollector(algo, test_venv_local),
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
    venv.close()
    test_venv_local.close()
    assert info.stop_triggered, f"best={info.best_reward}"


# -- v2 protocol: native dtypes, dict obs, fault tolerance -------------------


class _Uint8DictEnv:
    """Deterministic env with dict obs (uint8 pixels + float vec) to pin the
    dtype-preserving wire layout: pixels must cross at 1 byte/px."""

    def __init__(self):
        import gymnasium as gym

        self.observation_space = gym.spaces.Dict(
            {
                "pix": gym.spaces.Box(0, 255, (4, 4), np.uint8),
                "vec": gym.spaces.Box(-10, 10, (3,), np.float32),
            }
        )
        self.action_space = gym.spaces.Discrete(3)
        self.t = 0

    def _obs(self):
        return {
            "pix": np.full((4, 4), self.t % 256, np.uint8),
            "vec": np.full((3,), float(self.t), np.float32),
        }

    def reset(self, seed=None, options=None):
        self.t = 0
        return self._obs(), {}

    def step(self, act):
        self.t += 1
        return self._obs(), float(act), self.t >= 5, False, {}

    def close(self):
        pass


def _serve_in_thread(env_fns, port):
    import threading

    from tianshou_tpu.envs.remote import serve_envs

    th = threading.Thread(
        target=serve_envs,
        args=(env_fns, port),
        kwargs={"host": "127.0.0.1"},
        daemon=True,
    )
    th.start()
    return th


def test_uint8_dict_obs_roundtrip():
    """uint8 + dict observations cross the wire in native dtype and exact
    value (VERDICT r4 item 8; wire layout from the JSON handshake)."""
    port = _free_port()
    _serve_in_thread([_Uint8DictEnv for _ in range(3)], port)
    venv = _connect([f"127.0.0.1:{port}"])
    assert venv.num_envs == 3
    assert isinstance(venv.observation_space, dict)
    obs = venv.reset(seed=0)
    assert obs["pix"].dtype == np.uint8 and obs["pix"].shape == (3, 4, 4)
    assert obs["vec"].dtype == np.float32
    np.testing.assert_array_equal(obs["pix"], 0)
    for t in range(1, 7):
        res, carry = venv.step(np.array([0, 1, 2], np.int32))
        te = t if t <= 5 else 1  # all envs auto-reset together at t=5
        assert res.obs["pix"].dtype == np.uint8
        np.testing.assert_array_equal(res.obs["pix"], te % 256)
        np.testing.assert_allclose(res.obs["vec"], float(te))
        np.testing.assert_allclose(res.reward, [0.0, 1.0, 2.0])
        if te == 5:
            assert res.terminated.all()
            np.testing.assert_array_equal(carry["pix"], 0)  # reset obs
        else:
            assert not res.terminated.any()
    venv.close()


def test_farm_process_restart_resumes():
    """Kill the farm process mid-run, restart it on the same port (an
    external supervisor's job): the learner transparently reconnects and
    the in-flight step is re-issued (at-least-once) — the analog of a Ray
    actor restart."""
    port = _free_port()
    proc = _spawn_farm("CartPole-v1", 4, port)
    venv = _connect([f"127.0.0.1:{port}"])
    venv.reset(seed=0)
    res, _ = venv.step(np.zeros(4, np.int32))
    assert res.obs.shape == (4, 4)
    proc.kill()
    proc.wait()
    proc2 = _spawn_farm("CartPole-v1", 4, port)
    try:
        # next step sees the dead socket, reconnects (bounded retry), and
        # succeeds against the fresh farm
        res, carry = venv.step(np.ones(4, np.int32))
        assert res.obs.shape == (4, 4) and carry.shape == (4, 4)
        venv.close()
    finally:
        proc2.kill()
        proc2.wait()


class _CrashOnceEnv:
    """Env whose step raises exactly once per process (class flag) to
    exercise the farm-side fleet rebuild."""

    crashed = False

    def __init__(self):
        import gymnasium as gym

        self.observation_space = gym.spaces.Box(-1, 1, (2,), np.float32)
        self.action_space = gym.spaces.Discrete(2)
        self.t = 0

    def reset(self, seed=None, options=None):
        self.t = 0
        return np.zeros(2, np.float32), {}

    def step(self, act):
        if int(act) == 1 and not _CrashOnceEnv.crashed:
            _CrashOnceEnv.crashed = True
            raise RuntimeError("simulated env crash")
        self.t += 1
        return np.full(2, self.t, np.float32), 1.0, False, self.t >= 50, {}

    def close(self):
        pass


def test_env_crash_rebuilds_fleet():
    """An env exception inside the farm rebuilds the fleet and drops the
    connection; the client's retry lands on the rebuilt (reset) fleet."""
    _CrashOnceEnv.crashed = False
    port = _free_port()
    _serve_in_thread([_CrashOnceEnv for _ in range(2)], port)
    venv = _connect([f"127.0.0.1:{port}"])
    venv.reset(seed=0)
    res, _ = venv.step(np.zeros(2, np.int32))
    np.testing.assert_allclose(res.obs, 1.0)
    # this step crashes env 0 server-side; the retried request steps the
    # REBUILT fleet from its reset state -> obs counts restart at 1
    res, _ = venv.step(np.array([1, 0], np.int32))
    np.testing.assert_allclose(res.obs, 1.0)
    res, _ = venv.step(np.zeros(2, np.int32))
    np.testing.assert_allclose(res.obs, 2.0)
    venv.close()
