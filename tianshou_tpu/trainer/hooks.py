"""Shared trainer-side observability hooks.

TPU-native counterparts of the reference trainer's ergonomics
(``tianshou/trainer/base.py``): tqdm progress display (``base.py:301-330``),
moving-average loss smoothing (``base.py:512-537``), plus ``jax.profiler``
device tracing, which the reference has no analog of (SURVEY.md §5 calls for
adding it).
"""

from __future__ import annotations

import contextlib

import jax

from tianshou_tpu.utils.statistics import MovAvg

__all__ = ["MetricSmoother", "RunContext"]


class MetricSmoother:
    """Per-key moving-average smoothing of scalar train metrics (the
    reference smooths losses with ``MovAvg`` before logging,
    ``trainer/base.py:512-537``)."""

    def __init__(self, window: int = 100):
        self.window = window
        self._avgs: dict[str, MovAvg] = {}

    def __call__(self, metrics: dict) -> dict:
        if self.window <= 1:
            return dict(metrics)
        out = {}
        for k, v in metrics.items():
            avg = self._avgs.get(k)
            if avg is None:
                avg = self._avgs[k] = MovAvg(self.window)
            out[k] = avg.add(v)
        return out


class RunContext(contextlib.AbstractContextManager):
    """One training run's host-side instrumentation: an optional tqdm bar
    over total env steps and an optional ``jax.profiler`` trace of the whole
    run (viewable with TensorBoard's profile plugin / Perfetto)."""

    def __init__(
        self,
        total_steps: int,
        show_progress: bool = False,
        profile_dir: str | None = None,
        desc: str = "train",
    ):
        self.total_steps = total_steps
        self.show_progress = show_progress
        self.profile_dir = profile_dir
        self.desc = desc
        self._bar = None
        self._tracing = False

    def __enter__(self) -> "RunContext":
        if self.show_progress:
            # tqdm ships with the ``logging`` extra; degrade gracefully on
            # a minimal install instead of crashing the training run
            try:
                from tqdm import tqdm
            except ImportError:
                tqdm = None
            if tqdm is not None:
                self._bar = tqdm(total=self.total_steps, desc=self.desc,
                                 unit="step", dynamic_ncols=True)
        if self.profile_dir is not None:
            jax.profiler.start_trace(self.profile_dir)
            self._tracing = True
        return self

    def step(self, n: int, postfix: dict | None = None) -> None:
        if self._bar is not None:
            if postfix:
                self._bar.set_postfix(postfix, refresh=False)
            self._bar.update(n)

    def __exit__(self, *exc) -> None:
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
        if self._bar is not None:
            self._bar.close()
            self._bar = None
        return None
