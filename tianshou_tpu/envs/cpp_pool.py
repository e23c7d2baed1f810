"""ctypes bindings for the native C++ environment pool.

The EnvPool analog (reference optional dep ``envpool = "^0.8.2"``,
integration ``highlevel/env.py:323-360``): compiled batched env dynamics on
the host with a persistent thread pool, zero Python work per env-step.
Exposes the same interface as :class:`HostVectorEnv` so ``HostCollector``
and the trainers work unchanged.

The shared library is built on demand with ``g++ -O3`` (see
``native/Makefile``); no pybind11 required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Any

import numpy as np

from tianshou_tpu.envs.host import HostStepResult
from tianshou_tpu.envs.spaces import Box, Discrete

__all__ = ["CppVectorEnv", "build_native_lib"]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtpuenvpool.so")

_SPACES = {
    "CartPole-v1": (Box(low=-np.inf, high=np.inf, shape=(4,)), Discrete(2)),
    "Pendulum-v1": (
        Box(low=(-1.0, -1.0, -8.0), high=(1.0, 1.0, 8.0), shape=(3,)),
        Box(low=-2.0, high=2.0, shape=(1,)),
    ),
    "MountainCar-v0": (
        Box(low=(-1.2, -0.07), high=(0.6, 0.07), shape=(2,)),
        Discrete(3),
    ),
    "Acrobot-v1": (
        Box(
            low=(-1.0, -1.0, -1.0, -1.0, -4 * np.pi, -9 * np.pi),
            high=(1.0, 1.0, 1.0, 1.0, 4 * np.pi, 9 * np.pi),
            shape=(6,),
        ),
        Discrete(3),
    ),
    # 2-link planar reacher (own MuJoCo-Reacher-class spec; the
    # expensive-simulator demo: RK4 x 4 substeps of full manipulator
    # dynamics per control step — see native/cpp_envpool.cpp)
    "Reacher2": (
        Box(low=-np.inf, high=np.inf, shape=(10,)),
        Box(low=-1.0, high=1.0, shape=(2,)),
    ),
}


def build_native_lib(force: bool = False) -> str:
    src = os.path.join(_NATIVE_DIR, "cpp_envpool.cpp")
    if force or not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    ):
        subprocess.run(
            [
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                "-o", _LIB_PATH, src,
            ],
            check=True,
            capture_output=True,
        )
    return _LIB_PATH


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_native_lib())
        lib.envpool_create.restype = ctypes.c_void_p
        lib.envpool_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        ]
        lib.envpool_destroy.argtypes = [ctypes.c_void_p]
        for f in (lib.envpool_obs_dim, lib.envpool_discrete, lib.envpool_act_dim):
            f.restype = ctypes.c_int
            f.argtypes = [ctypes.c_void_p]
        fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.envpool_reset.argtypes = [ctypes.c_void_p, fp]
        lib.envpool_step.argtypes = [ctypes.c_void_p, fp, fp, fp, u8, u8, fp]
        _lib = lib
    return _lib


class CppVectorEnv:
    """Native batched env pool; drop-in for :class:`HostVectorEnv`."""

    is_host_env = True

    def __init__(
        self,
        task: str,
        num_envs: int,
        seed: int = 0,
        num_threads: int = 0,
    ):
        if task not in _SPACES:
            raise KeyError(f"native pool supports {sorted(_SPACES)}, got {task}")
        self.task = task
        self.num_envs = num_envs
        self.observation_space, self.action_space = _SPACES[task]
        self._lib = _load()
        self._pool = self._lib.envpool_create(
            task.encode(), num_envs, seed, num_threads
        )
        assert self._pool, "envpool_create failed"
        d = self._lib.envpool_obs_dim(self._pool)
        self._obs = np.empty((num_envs, d), np.float32)
        self._carry = np.empty((num_envs, d), np.float32)
        self._rew = np.empty((num_envs,), np.float32)
        self._term = np.empty((num_envs,), np.uint8)
        self._trunc = np.empty((num_envs,), np.uint8)

    def reset(self, seed: int | None = None) -> np.ndarray:
        # seed is baked at construction (per-env SplitMix64 streams)
        self._lib.envpool_reset(self._pool, self._obs)
        return self._obs.copy()

    def step(self, actions: np.ndarray) -> tuple[HostStepResult, np.ndarray]:
        # flat [num_envs * act_dim] layout (act_dim columns per env; one
        # column for discrete/1-d actions)
        acts = np.ascontiguousarray(
            np.asarray(actions, np.float32).reshape(self.num_envs, -1)
        ).reshape(-1)
        self._lib.envpool_step(
            self._pool, acts, self._obs, self._rew,
            self._term, self._trunc, self._carry,
        )
        return (
            HostStepResult(
                self._obs.copy(),
                self._rew.copy(),
                self._term.astype(bool),
                self._trunc.astype(bool),
            ),
            self._carry.copy(),
        )

    def close(self) -> None:
        if self._pool:
            self._lib.envpool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
