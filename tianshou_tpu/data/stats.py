"""Statistics dataclasses (reference ``tianshou/data/stats.py:14-89``)."""

from __future__ import annotations

import dataclasses

import numpy as np

from tianshou_tpu.utils.repr import DataclassPPrintMixin

__all__ = ["SequenceSummaryStats", "TimingStats", "InfoStats"]


@dataclasses.dataclass
class SequenceSummaryStats(DataclassPPrintMixin):
    """Mean/std/max/min summary of a sequence (``stats.py:14-30``)."""

    mean: float
    std: float
    max: float
    min: float

    @classmethod
    def from_sequence(cls, seq) -> "SequenceSummaryStats":
        arr = np.asarray(seq, np.float64)
        if arr.size == 0:
            return cls(0.0, 0.0, 0.0, 0.0)
        return cls(
            float(arr.mean()), float(arr.std()), float(arr.max()), float(arr.min())
        )


@dataclasses.dataclass
class TimingStats(DataclassPPrintMixin):
    """Wall-clock breakdown (``stats.py:34-48``)."""

    total_time: float = 0.0
    train_time: float = 0.0
    train_time_collect: float = 0.0
    train_time_update: float = 0.0
    test_time: float = 0.0
    update_speed: float = 0.0


@dataclasses.dataclass
class InfoStats(DataclassPPrintMixin):
    """End-of-run summary (``stats.py:52-71`` / ``gather_info``)."""

    gradient_step: int
    env_step: int
    epoch: int
    best_reward: float
    best_reward_std: float
    duration: float
    train_time: float = 0.0
    stop_triggered: bool = False
    last_metrics: dict = dataclasses.field(default_factory=dict)

    @property
    def env_steps_per_sec(self) -> float:
        return self.env_step / self.duration if self.duration > 0 else 0.0
