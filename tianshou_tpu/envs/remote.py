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

Wire protocol v2 (per connection, length-prefixed):

- handshake: server -> client, one **JSON** document (never pickle — the
  handshake crosses a trust boundary and must not be executable) carrying
  ``num_envs``, the native space specs, and per-field observation
  descriptors ``[name, shape, dtype]`` probed from a real reset, so every
  later message is raw fixed-layout bytes with no embedded metadata;
- ``RESET``: 8-byte seed (int64; -1 = unseeded) -> the concatenated obs
  fields, each in its **native dtype** (uint8 pixels cross the wire at
  1x, not inflated to float32);
- ``STEP``: raw action bytes (float32 for Box, int32 for Discrete /
  MultiDiscrete) -> ONE buffer holding (obs fields, rew float32,
  terminated uint8, truncated uint8, carry fields) — a step costs one
  round trip regardless of the field count (the TCP analog of
  :class:`~tianshou_tpu.utils.transfer.TreePacker`);
- ``CLOSE``: empty payload, server drops the connection but keeps the
  farm alive for the next learner.

Dict observations (the MARL/goal-env convention) are supported: the
handshake lists one descriptor per key (sorted), and both sides pack the
fields in that order.

Fault tolerance (the analog of Ray actor restart, which the reference
relies on implicitly):

- if an **env crashes** inside the farm, the farm rebuilds its entire env
  fleet from ``env_fns``, logs the error, and drops the connection;
- if the **farm process dies** and a supervisor restarts it, or the
  network blips, the learner-side :class:`_Farm` transparently
  reconnects (bounded retry), re-validates the handshake, and re-issues
  the in-flight request.  Requests therefore have *at-least-once*
  semantics across reconnects: a retried STEP acts on whatever episode
  state the (possibly fresh) farm has, exactly like re-submitting a task
  to a restarted Ray actor — episode-level noise, not data corruption.

Security: the protocol is non-executable (JSON + raw numeric buffers),
but it is unauthenticated — run farms only on trusted/private networks
and prefer ``--host`` bound to an internal interface.

The farm machines need only Python + the env dependencies — they are NOT
jax processes and never join the mesh (the reference's Ray workers are
likewise learner-external).  Multiple farms are stepped concurrently from
a thread pool, so total latency is the slowest farm, not the sum.
"""

from __future__ import annotations

import json
import socket
import struct
import sys
import time
from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from tianshou_tpu.envs.host import HostStepResult, HostVectorEnv
from tianshou_tpu.envs.spaces import Box, Discrete, MultiDiscrete

__all__ = ["serve_envs", "RemoteVectorEnv"]

_PROTO = 2

_CMD_RESET = 1
_CMD_STEP = 2
_CMD_CLOSE = 3


class _EnvCrash(Exception):
    """An exception raised by the hosted envs themselves (as opposed to a
    malformed client payload): triggers the fleet rebuild."""


class FarmMismatchError(RuntimeError):
    """Non-retryable handshake failure: wrong protocol version or a farm
    whose fleet shape changed across a reconnect.  Raised immediately
    instead of burning the reconnect budget on guaranteed-futile retries."""


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


# -- JSON space specs (non-executable handshake encoding) -------------------

def _space_to_json(space) -> dict:
    if isinstance(space, Discrete):
        return {"type": "discrete", "n": space.n}
    if isinstance(space, MultiDiscrete):
        return {"type": "multidiscrete", "nvec": list(space.nvec)}
    if isinstance(space, Box):
        low = space.low if isinstance(space.low, float) else list(space.low)
        high = space.high if isinstance(space.high, float) else list(space.high)
        return {"type": "box", "low": low, "high": high, "shape": list(space.shape)}
    if isinstance(space, dict):
        return {"type": "dict", "fields": {k: _space_to_json(v) for k, v in space.items()}}
    raise TypeError(f"cannot encode space {space!r} for the farm handshake")


def _space_from_json(d: dict):
    t = d["type"]
    if t == "discrete":
        return Discrete(int(d["n"]))
    if t == "multidiscrete":
        return MultiDiscrete(tuple(int(n) for n in d["nvec"]))
    if t == "box":
        as_bound = lambda b: float(b) if isinstance(b, (int, float)) else tuple(b)
        return Box(low=as_bound(d["low"]), high=as_bound(d["high"]), shape=tuple(d["shape"]))
    if t == "dict":
        return {k: _space_from_json(v) for k, v in d["fields"]. items()}
    raise ValueError(f"unknown space type {t!r} in farm handshake")


# -- per-field obs descriptors ----------------------------------------------

class _ObsCodec:
    """Fixed-layout (de)serialization of a (possibly dict) stacked obs.

    ``fields`` is ``[(name_or_None, per_env_shape, dtype_str), ...]`` —
    probed server-side from a real reset and shipped in the handshake, so
    both ends agree on the byte layout without per-message metadata.
    """

    def __init__(self, fields: Sequence[tuple], num_envs: int):
        self.fields = [(n, tuple(int(s) for s in sh), str(dt)) for n, sh, dt in fields]
        self.num_envs = num_envs
        self.is_dict = self.fields[0][0] is not None
        self.nbytes = sum(
            num_envs * int(np.prod(sh, dtype=np.int64)) * np.dtype(dt).itemsize
            for _, sh, dt in self.fields
        )

    @classmethod
    def probe(cls, obs, num_envs: int) -> "_ObsCodec":
        if isinstance(obs, dict):
            fields = [
                (k, np.asarray(obs[k]).shape[1:], np.asarray(obs[k]).dtype.name)
                for k in sorted(obs)
            ]
        else:
            a = np.asarray(obs)
            fields = [(None, a.shape[1:], a.dtype.name)]
        return cls(fields, num_envs)

    def pack(self, obs) -> bytes:
        parts = []
        for name, sh, dt in self.fields:
            a = obs[name] if name is not None else obs
            parts.append(np.ascontiguousarray(a, np.dtype(dt)).tobytes())
        return b"".join(parts)

    def unpack(self, buf: bytes, off: int = 0):
        out = {}
        for name, sh, dt in self.fields:
            dtype = np.dtype(dt)
            count = self.num_envs * int(np.prod(sh, dtype=np.int64))
            a = np.frombuffer(buf, dtype, count=count, offset=off)
            off += count * dtype.itemsize
            out[name] = a.reshape((self.num_envs, *sh)).copy()
        return (out if self.is_dict else out[None]), off


def _pack_step(codec: _ObsCodec, res: HostStepResult, carry) -> bytes:
    return b"".join(
        [
            codec.pack(res.obs),
            np.asarray(res.reward, np.float32).tobytes(),
            np.asarray(res.terminated, np.uint8).tobytes(),
            np.asarray(res.truncated, np.uint8).tobytes(),
            codec.pack(carry),
        ]
    )


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
    a driver restart.  If an env raises during step/reset, the whole
    fleet is rebuilt from ``env_fns`` and the connection is dropped — the
    client reconnects and retries (see module docstring).

    Farms are unauthenticated: bind to a trusted/private interface.
    """
    env_fns = list(env_fns)
    venv = HostVectorEnv(env_fns)
    probe_obs = venv.reset()
    codec = _ObsCodec.probe(probe_obs, venv.num_envs)
    act_space = venv.action_space
    hello = json.dumps(
        {
            "proto": _PROTO,
            "num_envs": venv.num_envs,
            "observation_space": _space_to_json(venv.observation_space),
            "action_space": _space_to_json(act_space),
            "obs_fields": [[n, list(sh), dt] for n, sh, dt in codec.fields],
        }
    ).encode()
    discrete_act = isinstance(act_space, (Discrete, MultiDiscrete))
    act_dtype = np.int32 if discrete_act else np.float32
    act_shape = (venv.num_envs, *act_space.shape)

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
                        try:
                            obs = venv.reset(None if seed < 0 else int(seed))
                        except Exception as exc:
                            raise _EnvCrash(exc) from exc
                        out = codec.pack(obs)
                        conn.sendall(struct.pack("<I", len(out)) + out)
                    elif cmd == _CMD_STEP:
                        # payload decoding errors are PROTOCOL errors (a
                        # malformed or hostile client), not env crashes —
                        # they drop the connection below without touching
                        # the fleet
                        act = np.frombuffer(payload, act_dtype).reshape(act_shape)
                        try:
                            res, carry = venv.step(act)
                        except Exception as exc:
                            raise _EnvCrash(exc) from exc
                        out = _pack_step(codec, res, carry)
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
            except _EnvCrash as exc:  # env crashed: rebuild the fleet
                print(
                    f"[farm] env failure ({exc!r}); rebuilding fleet",
                    file=sys.stderr,
                    flush=True,
                )
                try:
                    venv.close()
                except Exception:
                    pass
                venv = HostVectorEnv(env_fns)
                venv.reset()
                continue  # drop the connection; client reconnect retries
            except Exception as exc:
                # protocol violation (bad payload size, unknown command,
                # port scanner): drop THIS connection, keep the fleet and
                # its episode state intact for the legitimate learner
                print(
                    f"[farm] protocol error ({exc!r}); dropping connection",
                    file=sys.stderr,
                    flush=True,
                )
                continue
            finally:
                try:
                    conn.close()
                except OSError:
                    pass
    finally:
        srv.close()
        venv.close()


class _Farm:
    """One TCP connection to one env farm, with transparent reconnect."""

    def __init__(self, address: str, reconnect_timeout: float = 60.0):
        host, port = address.rsplit(":", 1)
        self.address = (host, int(port))
        self.reconnect_timeout = reconnect_timeout
        self.sock = None
        self._handshake(first=True)

    def _handshake(self, first: bool = False) -> None:
        self.sock = socket.create_connection(self.address)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        (ln,) = struct.unpack("<I", _recv_exact(self.sock, 4))
        hello = json.loads(_recv_exact(self.sock, ln).decode())
        if hello.get("proto") != _PROTO:
            raise FarmMismatchError(
                f"farm at {self.address} speaks protocol "
                f"{hello.get('proto')!r}, expected {_PROTO}"
            )
        num_envs = int(hello["num_envs"])
        codec = _ObsCodec(
            [(n, sh, dt) for n, sh, dt in hello["obs_fields"]], num_envs
        )
        if first:
            self.num_envs = num_envs
            self.codec = codec
            self.observation_space = _space_from_json(hello["observation_space"])
            self.action_space = _space_from_json(hello["action_space"])
        elif num_envs != self.num_envs or codec.fields != self.codec.fields:
            # fail fast: retrying cannot fix a farm restarted with a
            # different fleet — surface the real diagnosis immediately
            raise FarmMismatchError(
                f"farm at {self.address} changed shape across reconnect "
                f"(num_envs {self.num_envs}->{num_envs})"
            )

    def _request(self, cmd: int, payload: bytes) -> bytes:
        """Send one request; reconnect + retry on connection failure.

        At-least-once: a request that died in flight is re-issued against
        the (possibly restarted) farm — see module docstring.
        """
        deadline = time.monotonic() + self.reconnect_timeout
        while True:
            try:
                if self.sock is None:
                    self._handshake()
                _send_msg(self.sock, cmd, payload)
                (ln,) = struct.unpack("<I", _recv_exact(self.sock, 4))
                return _recv_exact(self.sock, ln)
            except (ConnectionError, OSError) as exc:
                if self.sock is not None:
                    try:
                        self.sock.close()
                    except OSError:
                        pass
                    self.sock = None
                if time.monotonic() > deadline:
                    raise ConnectionError(
                        f"farm at {self.address} unreachable for "
                        f"{self.reconnect_timeout:.0f}s: {exc}"
                    ) from exc
                time.sleep(0.3)

    def reset(self, seed: int | None):
        buf = self._request(
            _CMD_RESET, struct.pack("<q", -1 if seed is None else seed)
        )
        obs, _ = self.codec.unpack(buf)
        return obs

    def step(self, actions: np.ndarray) -> tuple[HostStepResult, np.ndarray]:
        dtype = (
            np.int32
            if isinstance(self.action_space, (Discrete, MultiDiscrete))
            else np.float32
        )
        buf = self._request(
            _CMD_STEP, np.ascontiguousarray(actions, dtype).tobytes()
        )
        obs, off = self.codec.unpack(buf)
        n = self.num_envs
        rew = np.frombuffer(buf, np.float32, count=n, offset=off).copy()
        off += 4 * n
        term = np.frombuffer(buf, np.uint8, count=n, offset=off) > 0
        off += n
        trunc = np.frombuffer(buf, np.uint8, count=n, offset=off) > 0
        off += n
        carry, _ = self.codec.unpack(buf, off)
        return HostStepResult(obs, rew, term, trunc), carry

    def close(self) -> None:
        if self.sock is not None:
            try:
                _send_msg(self.sock, _CMD_CLOSE, b"")
            except OSError:
                pass
            self.sock.close()
            self.sock = None


def _cat_obs(items: list):
    if isinstance(items[0], dict):
        return {k: np.concatenate([it[k] for it in items]) for k in items[0]}
    return np.concatenate(items, axis=0)


class RemoteVectorEnv:
    """Drive one or more remote env farms as a single host venv.

    ``addresses``: ``["host1:5555", "host2:5555", ...]``; env counts are
    whatever each farm hosts, concatenated in address order.  Farms are
    stepped CONCURRENTLY (thread pool), so wall time per step is the
    slowest farm's round trip, matching the reference's parallel
    ``ray.get`` over worker futures.  Farm restarts and network blips are
    absorbed by per-farm reconnect (``reconnect_timeout`` seconds).
    """

    is_host_env = True

    def __init__(self, addresses: Sequence[str], reconnect_timeout: float = 60.0):
        self.farms = [_Farm(a, reconnect_timeout) for a in addresses]
        self.num_envs = sum(f.num_envs for f in self.farms)
        self.observation_space = self.farms[0].observation_space
        self.action_space = self.farms[0].action_space
        self.pool = ThreadPoolExecutor(max_workers=len(self.farms))
        self._splits = np.cumsum([f.num_envs for f in self.farms])[:-1]

    def reset(self, seed: int | None = None):
        seeds = [
            None if seed is None else seed + int(off)
            for off in [0, *self._splits]
        ]
        obs = list(self.pool.map(lambda fs: fs[0].reset(fs[1]), zip(self.farms, seeds)))
        return _cat_obs(obs)

    def step(self, actions: np.ndarray) -> tuple[HostStepResult, np.ndarray]:
        chunks = np.split(np.asarray(actions), self._splits, axis=0)
        outs = list(
            self.pool.map(lambda fa: fa[0].step(fa[1]), zip(self.farms, chunks))
        )
        results = [o[0] for o in outs]
        return (
            HostStepResult(
                _cat_obs([r.obs for r in results]),
                np.concatenate([r.reward for r in results]),
                np.concatenate([r.terminated for r in results]),
                np.concatenate([r.truncated for r in results]),
            ),
            _cat_obs([o[1] for o in outs]),
        )

    def close(self) -> None:
        for f in self.farms:
            f.close()
        self.pool.shutdown(wait=False)


def _main() -> None:  # pragma: no cover - exercised via subprocess in tests
    import argparse

    p = argparse.ArgumentParser(description="Serve a remote env farm")
    p.add_argument(
        "--env",
        required=True,
        help="gymnasium env id, or 'module:factory' dotted path to a "
        "zero-arg callable returning an env",
    )
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument("--port", type=int, required=True)
    p.add_argument(
        "--host",
        default="0.0.0.0",
        help="bind interface; farms are unauthenticated — prefer a "
        "private/trusted interface",
    )
    args = p.parse_args()

    if ":" in args.env:
        import importlib

        mod, fn = args.env.split(":", 1)
        make = getattr(importlib.import_module(mod), fn)
    else:
        import gymnasium as gym

        make = lambda: gym.make(args.env)

    serve_envs(
        [make for _ in range(args.num_envs)],
        port=args.port,
        host=args.host,
    )


if __name__ == "__main__":
    _main()
