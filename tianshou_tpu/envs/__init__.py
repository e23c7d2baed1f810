"""Environment layer: pure-JAX envs + host gymnasium bridge."""

from tianshou_tpu.envs.base import JaxEnv, StepResult, VectorEnv
from tianshou_tpu.envs.classic import make_env
from tianshou_tpu.envs.finite import FiniteHostVectorEnv, collect_dataset_episodes
from tianshou_tpu.envs.minatar import make_minatar
from tianshou_tpu.envs.norm import NormObsVectorEnv
from tianshou_tpu.envs.spaces import Box, Discrete, MultiDiscrete

__all__ = [
    "Box", "Discrete", "FiniteHostVectorEnv", "JaxEnv", "collect_dataset_episodes",
    "make_env", "make_minatar", "MultiDiscrete",
    "NormObsVectorEnv", "StepResult", "VectorEnv",
]
