"""Remote environment farms: env workers on machines OUTSIDE the mesh.

TPU-native counterpart of the reference's Ray cluster env workers
(``tianshou/env/worker/ray.py:1-79`` + ``venvs.py RayVectorEnv``): the
reference ships env stepping to Ray actors anywhere on the cluster; here a
farm is a plain TCP server (:func:`serve_envs`, or ``python -m
tianshou_tpu.envs.remote`` on any box) hosting a thread-pooled
:class:`~tianshou_tpu.envs.host.HostVectorEnv`, and
:class:`RemoteVectorEnv` is the learner-side client that drives one or
more farms in parallel and presents the standard host-venv surface
(``num_envs / reset / step -> (HostStepResult, carry)``), so it drops into
``HostCollector`` + the trainers unchanged.

Wire protocol (per connection, length-prefixed):

- handshake: server -> client, one pickled dict with ``num_envs`` and the
  native space specs;
- ``RESET``: 8-byte seed (int64; -1 = unseeded) -> one packed float32
  buffer of the stacked reset observations;
- ``STEP``: raw action bytes (float32 for Box, int32 for Discrete)
  -> ONE packed float32 buffer holding (obs, rew, terminated, truncated,
  carry) — the same single-buffer trick as
  :class:`~tianshou_tpu.utils.transfer.TreePacker`, so a step costs one
  round trip regardless of the field count;
- ``CLOSE``: empty payload, server tears down.

The farm machines need only Python + the env dependencies — they are NOT
jax processes and never join the mesh (the reference's Ray workers are
likewise learner-external).  Multiple farms are stepped concurrently from
a thread pool, so total latency is the slowest farm, not the sum.
"""

from __future__ import annotations

import pickle
import socket
import struct
from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from tianshou_tpu.envs.host import HostStepResult, HostVectorEnv
from tianshou_tpu.envs.spaces import Box, Discrete

__all__ = ["serve_envs", "RemoteVectorEnv"]

_CMD_RESET = 1
_CMD_STEP = 2
_CMD_CLOSE = 3


def _send_msg(sock: socket.socket, cmd: int, payload: bytes) -> None:
    sock.sendall(struct.pack("<II", cmd, len(payload)) + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("remote env farm closed the connection")
        buf.extend(chunk)
    return bytes(buf)


def _recv_msg(sock: socket.socket) -> tuple[int, bytes]:
    cmd, ln = struct.unpack("<II", _recv_exact(sock, 8))
    return cmd, _recv_exact(sock, ln)


def _pack_step(res: HostStepResult, carry: np.ndarray) -> bytes:
    """(obs, rew, term, trunc, carry) as one float32 buffer."""
    parts = [
        np.asarray(res.obs, np.float32).ravel(),
        np.asarray(res.reward, np.float32).ravel(),
        np.asarray(res.terminated, np.float32).ravel(),
        np.asarray(res.truncated, np.float32).ravel(),
        np.asarray(carry, np.float32).ravel(),
    ]
    return np.concatenate(parts).tobytes()


def serve_envs(
    env_fns: Sequence[Callable],
    port: int,
    host: str = "0.0.0.0",
    max_connections: int = 16,
) -> None:
    """Host ``len(env_fns)`` environments and serve step/reset requests.

    Blocks forever (run it on the farm machine); ONE learner connection at
    a time drives the envs (a farm backs exactly one client venv — run a
    second farm process for a test fleet), and reconnects are accepted:
    the env fleet persists across connections, like a Ray actor surviving
    a driver restart.
    """
    venv = HostVectorEnv(env_fns)
    obs_space, act_space = venv.observation_space, venv.action_space
    hello = pickle.dumps(
        {
            "num_envs": venv.num_envs,
            "observation_space": obs_space,
            "action_space": act_space,
        }
    )
    act_dtype = np.int32 if isinstance(act_space, Discrete) else np.float32
    act_shape = (
        (venv.num_envs,)
        if isinstance(act_space, Discrete)
        else (venv.num_envs, *act_space.shape)
    )

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(max_connections)
    try:
        while True:
            conn, _ = srv.accept()
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            try:
                conn.sendall(struct.pack("<I", len(hello)) + hello)
                while True:
                    cmd, payload = _recv_msg(conn)
                    if cmd == _CMD_RESET:
                        (seed,) = struct.unpack("<q", payload)
                        obs = venv.reset(None if seed < 0 else int(seed))
                        out = np.asarray(obs, np.float32).tobytes()
                        conn.sendall(struct.pack("<I", len(out)) + out)
                    elif cmd == _CMD_STEP:
                        act = np.frombuffer(payload, act_dtype).reshape(act_shape)
                        res, carry = venv.step(act)
                        out = _pack_step(res, carry)
                        conn.sendall(struct.pack("<I", len(out)) + out)
                    elif cmd == _CMD_CLOSE:
                        # close THIS connection; the farm itself stays up
                        # for the next learner (parity with a Ray actor
                        # outliving its driver)
                        break
                    else:  # pragma: no cover - protocol violation
                        raise ValueError(f"unknown command {cmd}")
            except (ConnectionError, OSError):
                continue  # learner went away; keep the farm alive
            finally:
                try:
                    conn.close()
                except OSError:
                    pass
    finally:
        srv.close()
        venv.close()


class _Farm:
    """One TCP connection to one env farm."""

    def __init__(self, address: str):
        host, port = address.rsplit(":", 1)
        self.sock = socket.create_connection((host, int(port)))
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        (ln,) = struct.unpack("<I", _recv_exact(self.sock, 4))
        hello = pickle.loads(_recv_exact(self.sock, ln))
        self.num_envs = int(hello["num_envs"])
        self.observation_space = hello["observation_space"]
        self.action_space = hello["action_space"]
        self.obs_shape = tuple(self.observation_space.shape)
        self.obs_size = int(np.prod(self.obs_shape))

    def reset(self, seed: int | None) -> np.ndarray:
        _send_msg(self.sock, _CMD_RESET, struct.pack("<q", -1 if seed is None else seed))
        (ln,) = struct.unpack("<I", _recv_exact(self.sock, 4))
        flat = np.frombuffer(_recv_exact(self.sock, ln), np.float32)
        return flat.reshape((self.num_envs, *self.obs_shape)).copy()

    def step(self, actions: np.ndarray) -> tuple[HostStepResult, np.ndarray]:
        dtype = (
            np.int32 if isinstance(self.action_space, Discrete) else np.float32
        )
        _send_msg(self.sock, _CMD_STEP, np.ascontiguousarray(actions, dtype).tobytes())
        (ln,) = struct.unpack("<I", _recv_exact(self.sock, 4))
        flat = np.frombuffer(_recv_exact(self.sock, ln), np.float32)
        n, sz = self.num_envs, self.obs_size
        obs = flat[: n * sz].reshape((n, *self.obs_shape))
        off = n * sz
        rew = flat[off : off + n]
        term = flat[off + n : off + 2 * n] > 0.5
        trunc = flat[off + 2 * n : off + 3 * n] > 0.5
        carry = flat[off + 3 * n :].reshape((n, *self.obs_shape))
        return (
            HostStepResult(obs.copy(), rew.copy(), term, trunc),
            carry.copy(),
        )

    def close(self) -> None:
        try:
            _send_msg(self.sock, _CMD_CLOSE, b"")
        except OSError:
            pass
        self.sock.close()


class RemoteVectorEnv:
    """Drive one or more remote env farms as a single host venv.

    ``addresses``: ``["host1:5555", "host2:5555", ...]``; env counts are
    whatever each farm hosts, concatenated in address order.  Farms are
    stepped CONCURRENTLY (thread pool), so wall time per step is the
    slowest farm's round trip, matching the reference's parallel
    ``ray.get`` over worker futures.
    """

    is_host_env = True

    def __init__(self, addresses: Sequence[str]):
        self.farms = [_Farm(a) for a in addresses]
        self.num_envs = sum(f.num_envs for f in self.farms)
        self.observation_space = self.farms[0].observation_space
        self.action_space = self.farms[0].action_space
        self.pool = ThreadPoolExecutor(max_workers=len(self.farms))
        self._splits = np.cumsum([f.num_envs for f in self.farms])[:-1]

    def reset(self, seed: int | None = None) -> np.ndarray:
        seeds = [
            None if seed is None else seed + int(off)
            for off in [0, *self._splits]
        ]
        obs = list(self.pool.map(lambda fs: fs[0].reset(fs[1]), zip(self.farms, seeds)))
        return np.concatenate(obs, axis=0)

    def step(self, actions: np.ndarray) -> tuple[HostStepResult, np.ndarray]:
        chunks = np.split(np.asarray(actions), self._splits, axis=0)
        outs = list(
            self.pool.map(lambda fa: fa[0].step(fa[1]), zip(self.farms, chunks))
        )
        results = [o[0] for o in outs]
        return (
            HostStepResult(
                np.concatenate([r.obs for r in results]),
                np.concatenate([r.reward for r in results]),
                np.concatenate([r.terminated for r in results]),
                np.concatenate([r.truncated for r in results]),
            ),
            np.concatenate([o[1] for o in outs]),
        )

    def close(self) -> None:
        for f in self.farms:
            f.close()
        self.pool.shutdown(wait=False)


def _main() -> None:  # pragma: no cover - exercised via subprocess in tests
    import argparse

    p = argparse.ArgumentParser(description="Serve a remote env farm")
    p.add_argument("--env", required=True, help="gymnasium env id")
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--host", default="0.0.0.0")
    args = p.parse_args()
    import gymnasium as gym

    serve_envs(
        [lambda: gym.make(args.env) for _ in range(args.num_envs)],
        port=args.port,
        host=args.host,
    )


if __name__ == "__main__":
    _main()
