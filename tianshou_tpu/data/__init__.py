"""Data layer: Batch pytree, replay buffers, persistence, statistics."""

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from tianshou_tpu.data.her import HERReplayBuffer
from tianshou_tpu.data.prio import PrioritizedReplayBuffer, PrioritizedReplayBufferState
from tianshou_tpu.data.stats import InfoStats, SequenceSummaryStats, TimingStats

__all__ = [
    "Batch", "HERReplayBuffer", "InfoStats", "PrioritizedReplayBuffer",
    "PrioritizedReplayBufferState", "ReplayBuffer", "ReplayBufferState",
    "SequenceSummaryStats", "TimingStats",
]
