"""Trainer loops: fused off-policy / on-policy / offline."""

from tianshou_tpu.trainer.offline import OfflineTrainer
from tianshou_tpu.trainer.offpolicy import OffPolicyTrainer
from tianshou_tpu.trainer.onpolicy import OnPolicyTrainer

__all__ = ["OfflineTrainer", "OffPolicyTrainer", "OnPolicyTrainer"]
