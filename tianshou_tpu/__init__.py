"""tianshou_tpu: a TPU-native deep reinforcement learning framework.

A from-scratch JAX/XLA re-design of the capabilities of Tianshou
(reference: aai-institute/tianshou v1.0.0): on-device vectorized
environments, HBM-resident replay buffers, jit-fused collect/update
training loops, and a functional policy zoo — built for TPU meshes
(`jax.sharding` + `shard_map`) rather than process-pool parallelism.
"""

__version__ = "0.1.0"

from tianshou_tpu.data.batch import Batch

__all__ = ["Batch", "__version__"]
