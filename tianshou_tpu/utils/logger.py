"""Logging infrastructure: base logger with data scopes, tensorboard,
wandb, and no-op loggers.

Counterpart of ``tianshou/utils/logger/`` (``BaseLogger``/``LazyLogger``
``logger/base.py:23,157``, ``TensorboardLogger`` ``logger/tensorboard.py:17``,
``WandbLogger`` ``logger/wandb.py:15``): four data scopes
(train/test/update/info) with per-scope write intervals, nested-dict
flattening to ``scope/key`` scalars, and save/restore of training counters
for resume (``restore_data`` ``tensorboard.py:120+``).
"""

from __future__ import annotations

import contextlib
from enum import Enum
from numbers import Number
from typing import Any, Callable

import numpy as np

__all__ = [
    "DataScope",
    "BaseLogger",
    "LazyLogger",
    "TensorboardLogger",
    "WandbLogger",
]


class DataScope(Enum):
    TRAIN = "train"
    TEST = "test"
    UPDATE = "update"
    INFO = "info"


def _flatten(data: dict, prefix: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for k, v in data.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        elif isinstance(v, Number | np.number | np.ndarray):
            arr = np.asarray(v)
            if arr.size == 1:
                out[key] = float(arr)
    return out


class BaseLogger:
    """Interval-gated scoped logging (``logger/base.py:23-117``)."""

    def __init__(
        self,
        train_interval: int = 1000,
        test_interval: int = 1,
        update_interval: int = 1000,
        info_interval: int = 1,
    ):
        self.intervals = {
            DataScope.TRAIN: train_interval,
            DataScope.TEST: test_interval,
            DataScope.UPDATE: update_interval,
            DataScope.INFO: info_interval,
        }
        self.last_log = {scope: -1 for scope in DataScope}

    # -- to be implemented by concrete loggers ------------------------------
    def write(self, step: int, data: dict[str, float]) -> None:
        raise NotImplementedError

    def save_data(
        self,
        epoch: int,
        env_step: int,
        gradient_step: int,
        save_checkpoint_fn: Callable | None = None,
    ) -> None:
        if save_checkpoint_fn is not None:
            save_checkpoint_fn(epoch, env_step, gradient_step)

    def restore_data(self) -> tuple[int, int, int]:
        """Return (epoch, env_step, gradient_step) to resume from."""
        return 0, 0, 0

    def finalize(self) -> None:
        pass

    # -- scope helpers -------------------------------------------------------
    def _log(self, scope: DataScope, data: dict, step: int) -> None:
        if step - self.last_log[scope] >= self.intervals[scope]:
            self.write(step, _flatten(data, scope.value))
            self.last_log[scope] = step

    def log_train_data(self, data: dict, step: int) -> None:
        self._log(DataScope.TRAIN, data, step)

    def log_test_data(self, data: dict, step: int) -> None:
        self._log(DataScope.TEST, data, step)

    def log_update_data(self, data: dict, step: int) -> None:
        self._log(DataScope.UPDATE, data, step)

    def log_info_data(self, data: dict, step: int) -> None:
        self._log(DataScope.INFO, data, step)


class LazyLogger(BaseLogger):
    """No-op logger (``logger/base.py:157``)."""

    def __init__(self):
        super().__init__()

    def write(self, step: int, data: dict[str, float]) -> None:
        pass


class TensorboardLogger(BaseLogger):
    """Scalar logging to a tensorboard event file + counter save/restore."""

    def __init__(self, log_dir: str, **kwargs):
        super().__init__(**kwargs)
        from torch.utils.tensorboard import SummaryWriter

        self.writer = SummaryWriter(log_dir)
        self.log_dir = log_dir

    def write(self, step: int, data: dict[str, float]) -> None:
        for k, v in data.items():
            self.writer.add_scalar(k, v, global_step=step)
        self.writer.flush()

    def save_data(
        self, epoch, env_step, gradient_step, save_checkpoint_fn=None
    ) -> None:
        self.write(
            env_step,
            {
                "save/epoch": epoch,
                "save/env_step": env_step,
                "save/gradient_step": gradient_step,
            },
        )
        super().save_data(epoch, env_step, gradient_step, save_checkpoint_fn)

    def restore_data(self) -> tuple[int, int, int]:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )

        acc = EventAccumulator(self.log_dir)
        acc.Reload()
        out = []
        for key in ("save/epoch", "save/env_step", "save/gradient_step"):
            try:
                out.append(int(acc.Scalars(key)[-1].value))
            except Exception:
                out.append(0)
        epoch, env_step, grad_step = out
        self.last_log[DataScope.TRAIN] = env_step - 1
        self.last_log[DataScope.UPDATE] = grad_step - 1
        return epoch, env_step, grad_step

    def restore_logged_data(self) -> dict[str, list[tuple[int, float]]]:
        """Read back all logged scalar series (``tensorboard.py`` parity)."""
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )

        acc = EventAccumulator(self.log_dir)
        acc.Reload()
        return {
            tag: [(s.step, s.value) for s in acc.Scalars(tag)]
            for tag in acc.Tags().get("scalars", [])
        }

    def finalize(self) -> None:
        self.writer.close()


class WandbLogger(BaseLogger):
    """Weights & Biases logger; degrades to no-op if wandb is unavailable
    (this image has no egress), mirroring the reference's optional dep."""

    def __init__(
        self,
        project: str = "tianshou_tpu",
        name: str | None = None,
        config: dict | None = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.wandb_run = None
        with contextlib.suppress(Exception):
            import wandb

            self.wandb_run = wandb.init(
                project=project, name=name, config=config, reinit=True
            )

    def write(self, step: int, data: dict[str, float]) -> None:
        if self.wandb_run is not None:
            self.wandb_run.log(data, step=step)

    def finalize(self) -> None:
        if self.wandb_run is not None:
            self.wandb_run.finish()
