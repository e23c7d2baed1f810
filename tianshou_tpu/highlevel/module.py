"""Default network factories dispatching on env type.

Counterpart of the reference's module-factory layer
(``tianshou/highlevel/module/actor.py:27-265`` ``ActorFactoryDefault``,
``module/critic.py:17-297``): given only the env metadata, produce the right
network family — discrete flat obs -> Q/logit MLPs (dueling optional),
continuous -> Gaussian/deterministic actors + (obs, act) critics, pixel obs
(rank >= 2) -> conv encoders sized by resolution (MinAtar-scale 3x3 conv vs
the Nature-DQN stack) — so experiment builders need zero user-supplied
networks.
"""

from __future__ import annotations

from flax import linen as nn

from tianshou_tpu.envs.spaces import Box, Discrete, MultiDiscrete
from tianshou_tpu.highlevel.env import Environments

__all__ = [
    "is_pixel_space",
    "default_q_network",
    "default_actor",
    "default_value_network",
    "default_continuous_critic",
]


def is_pixel_space(envs: Environments) -> bool:
    """Pixel-like observations = rank >= 2 (``[H, W, C]`` grids or
    ``[stack, H, W, C]`` frame stacks), the dispatch rule of the
    reference's default factories."""
    shape = getattr(envs.observation_space, "shape", ())
    return shape is not None and len(shape) >= 2


def _conv_encoder_name(envs: Environments) -> str:
    """MinAtar-scale grids (<= 32 px) use the small 3x3 encoder; anything
    larger gets the Nature-DQN stack."""
    shape = envs.observation_space.shape
    spatial = [s for s in shape[-3:-1]] if len(shape) >= 3 else list(shape)
    return "minatar" if max(spatial, default=0) <= 32 else "nature"


def default_q_network(
    envs: Environments,
    hidden_sizes: tuple[int, ...] = (128, 128),
    dueling: bool = False,
) -> nn.Module:
    """Q-network for a discrete action space: MLP for flat obs, conv
    encoder for pixel obs (the reference's env-dispatch,
    ``module/actor.py:27-265``)."""
    assert isinstance(envs.action_space, Discrete)
    n = envs.action_space.n
    if is_pixel_space(envs):
        from tianshou_tpu.networks.conv import ConvDuelingQNet, ConvQNet

        cls = ConvDuelingQNet if dueling else ConvQNet
        return cls(num_actions=n, encoder=_conv_encoder_name(envs))
    from tianshou_tpu.networks.common import DuelingQNet, QNet

    if dueling:
        return DuelingQNet(hidden_sizes, n)
    return QNet(hidden_sizes, n)


def default_actor(
    envs: Environments,
    hidden_sizes: tuple[int, ...] = (64, 64),
    conditioned_sigma: bool = False,
    deterministic: bool = False,
) -> nn.Module:
    """Policy network dispatching on the action space: Discrete ->
    logits net (conv for pixels), Box -> Gaussian (or deterministic)
    actor."""
    space = envs.action_space
    if isinstance(space, (Discrete, MultiDiscrete)):
        return default_q_network(envs, hidden_sizes)
    assert isinstance(space, Box)
    from tianshou_tpu.networks.continuous import DeterministicActor, GaussianActor

    act_dim = space.shape[0]
    if deterministic:
        return DeterministicActor(hidden_sizes, act_dim)
    return GaussianActor(
        hidden_sizes, act_dim, conditioned_sigma=conditioned_sigma
    )


def default_value_network(
    envs: Environments, hidden_sizes: tuple[int, ...] = (64, 64)
) -> nn.Module:
    """State-value net V(s) (on-policy critics); conv encoder for pixels."""
    if is_pixel_space(envs):
        from tianshou_tpu.networks.conv import ConvValueNet

        return ConvValueNet(encoder=_conv_encoder_name(envs))
    from tianshou_tpu.networks.continuous import ValueNet

    return ValueNet(hidden_sizes)


def default_continuous_critic(
    envs: Environments,
    hidden_sizes: tuple[int, ...] = (256, 256),
    num_critics: int = 2,
) -> nn.Module:
    """(obs, act) -> Q ensemble for the DDPG/TD3/SAC family."""
    from tianshou_tpu.networks.continuous import CriticEnsemble

    return CriticEnsemble(hidden_sizes, num_critics=num_critics)
