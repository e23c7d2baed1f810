"""Environment factories for the high-level API.

Counterpart of ``tianshou/highlevel/env.py`` (``EnvFactory:363``,
``Environments:105``, ``EnvFactoryRegistered``): one factory covers the
pure-JAX on-device backend (``make_env`` registry), another the host
gymnasium backend (the analog of gym.make/envpool selection,
``env.py:343-360``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Literal

from tianshou_tpu.envs.base import JaxEnv, VectorEnv
from tianshou_tpu.envs.classic import make_env
from tianshou_tpu.envs.host import HostVectorEnv, NormObsHostVectorEnv
from tianshou_tpu.envs.norm import NormObsVectorEnv
from tianshou_tpu.envs.spaces import Space

__all__ = [
    "Environments",
    "EnvFactory",
    "JaxEnvFactory",
    "GymEnvFactory",
    "RemoteEnvFactory",
]


@dataclasses.dataclass
class Environments:
    """Train/test venv pair + space metadata (reference ``Environments``)."""

    train_venv: Any
    test_venv: Any
    observation_space: Space
    action_space: Space
    backend: Literal["jax", "host"]


class EnvFactory:
    def create_envs(self, num_train: int, num_test: int) -> Environments:
        raise NotImplementedError


class JaxEnvFactory(EnvFactory):
    """On-device envs from the pure-JAX registry (or a given instance)."""

    def __init__(
        self,
        env: str | JaxEnv,
        obs_norm: bool = False,
    ):
        self.env = make_env(env) if isinstance(env, str) else env
        self.obs_norm = obs_norm

    def create_envs(self, num_train: int, num_test: int) -> Environments:
        if self.obs_norm:
            train = NormObsVectorEnv(self.env, num_train, update_rms=True)
            test = NormObsVectorEnv(self.env, num_test, update_rms=False)
        else:
            train = VectorEnv(self.env, num_train)
            test = VectorEnv(self.env, num_test)
        return Environments(
            train_venv=train,
            test_venv=test,
            observation_space=self.env.observation_space,
            action_space=self.env.action_space,
            backend="jax",
        )


class RemoteEnvFactory(EnvFactory):
    """Env farms on machines outside the mesh (``envs/remote.py``), the
    cluster analog of the reference's ``RayVectorEnv`` selection in its
    high-level env factory.  ``train_addresses``/``test_addresses`` are
    ``"host:port"`` farm endpoints; env counts come from the farms
    themselves (``num_train``/``num_test`` are validated against them)."""

    def __init__(
        self,
        train_addresses: list[str],
        test_addresses: list[str],
    ):
        self.train_addresses = train_addresses
        self.test_addresses = test_addresses

    def create_envs(self, num_train: int, num_test: int) -> Environments:
        from tianshou_tpu.envs.remote import RemoteVectorEnv

        train = RemoteVectorEnv(self.train_addresses)
        test = RemoteVectorEnv(self.test_addresses)
        for venv, want, kind in (
            (train, num_train, "train"),
            (test, num_test, "test"),
        ):
            assert venv.num_envs == want or want <= 0, (
                f"{kind} farms host {venv.num_envs} envs, config asks "
                f"for {want}"
            )
        return Environments(
            train_venv=train,
            test_venv=test,
            observation_space=train.observation_space,
            action_space=train.action_space,
            backend="host",
        )


class GymEnvFactory(EnvFactory):
    """Host gymnasium envs (MuJoCo/Atari/...), threaded vectorization."""

    def __init__(
        self,
        task: str | Callable[[], Any],
        obs_norm: bool = False,
        env_kwargs: dict | None = None,
    ):
        if isinstance(task, str):
            import gymnasium as gym

            kwargs = env_kwargs or {}
            self.make = lambda: gym.make(task, **kwargs)
        else:
            self.make = task
        self.obs_norm = obs_norm

    def create_envs(self, num_train: int, num_test: int) -> Environments:
        cls = NormObsHostVectorEnv if self.obs_norm else HostVectorEnv
        train = cls([self.make for _ in range(num_train)])
        test = cls([self.make for _ in range(num_test)])
        if self.obs_norm:
            test.update_rms = False
            test.set_rms(train.get_rms())  # shared object: live rms updates
        return Environments(
            train_venv=train,
            test_venv=test,
            observation_space=train.observation_space,
            action_space=train.action_space,
            backend="host",
        )
