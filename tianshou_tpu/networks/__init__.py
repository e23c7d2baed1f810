"""Network modules (flax.linen): MLP/Q heads, conv encoders, actors/critics."""

from tianshou_tpu.networks.conv import (
    ConvDuelingQNet,
    ConvQNet,
    MinAtarCNN,
    NatureCNN,
)

__all__ = ["ConvDuelingQNet", "ConvQNet", "MinAtarCNN", "NatureCNN"]
