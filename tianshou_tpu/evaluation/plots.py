"""rliable-style result figures: IQM sample-efficiency curves with
stratified-bootstrap CI bands, and performance profiles.

Counterpart of the reference's rliable presentation layer
(``tianshou/evaluation/rliable_evaluation_hl.py:55-218``): there, per-seed
test-return series are loaded from experiment tensorboard logs and rendered
through the rliable package; here the statistics come from
:mod:`tianshou_tpu.evaluation.aggregate` (native numpy) and the figures
from matplotlib (optional dependency — every entry point degrades to a
clear ImportError message if it is absent).
"""

from __future__ import annotations

import os

import numpy as np

from tianshou_tpu.evaluation.aggregate import bootstrap_ci, iqm, performance_profile

__all__ = [
    "load_test_return_series",
    "align_series",
    "plot_iqm_curves",
    "plot_performance_profiles",
]


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:  # pragma: no cover - matplotlib is in the image
        raise ImportError(
            "rliable plot outputs need matplotlib; the aggregation numbers "
            "in tianshou_tpu.evaluation.aggregate work without it"
        ) from e


def load_test_return_series(log_dir: str) -> list[tuple[int, float]]:
    """Read the ``test/returns_mean`` series from one experiment's
    tensorboard log directory (the per-seed input of the reference's
    ``RLiableExperimentResult.load_from_disk``)."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    series: list[tuple[int, float]] = []
    for name in sorted(os.listdir(log_dir)):
        if not name.startswith("events"):
            continue
        acc = EventAccumulator(
            os.path.join(log_dir, name), size_guidance={"scalars": 0}
        )
        acc.Reload()
        if "test/returns_mean" in acc.Tags()["scalars"]:
            series.extend(
                (int(e.step), float(e.value))
                for e in acc.Scalars("test/returns_mean")
            )
    series.sort()
    return series


def align_series(
    per_seed: list[list[tuple[int, float]]], num_points: int = 64
) -> tuple[np.ndarray, np.ndarray]:
    """Interpolate ragged per-seed (step, value) series onto a common env-step
    grid.  Returns ``(steps [T], scores [n_seeds, T])``."""
    assert per_seed and all(per_seed), "need at least one non-empty series"
    lo = max(s[0][0] for s in per_seed)
    hi = min(s[-1][0] for s in per_seed)
    grid = np.linspace(lo, hi, num_points)
    rows = []
    for s in per_seed:
        xs = np.asarray([p[0] for p in s], np.float64)
        ys = np.asarray([p[1] for p in s], np.float64)
        rows.append(np.interp(grid, xs, ys))
    return grid, np.stack(rows)


def plot_iqm_curves(
    results: dict[str, tuple[np.ndarray, np.ndarray]],
    out_path: str,
    *,
    title: str = "",
    xlabel: str = "env step",
    ylabel: str = "IQM test return",
    n_boot: int = 500,
) -> str:
    """Sample-efficiency figure: per-algorithm IQM of test return over env
    steps with bootstrap CI bands (reference ``eval_experiments`` plot).

    ``results`` maps label -> ``(steps [T], scores [n_seeds, T])`` (the
    output of :func:`align_series`).  Saves a PNG and returns its path."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for label, (steps, scores) in results.items():
        mid = np.asarray([iqm(scores[:, t]) for t in range(scores.shape[1])])
        band = np.asarray(
            [
                bootstrap_ci(scores[:, t], n_boot=n_boot)
                for t in range(scores.shape[1])
            ]
        )
        ax.plot(steps, mid, label=label)
        ax.fill_between(steps, band[:, 0], band[:, 1], alpha=0.25)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    if title:
        ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_performance_profiles(
    final_scores: dict[str, np.ndarray],
    out_path: str,
    *,
    num_taus: int = 101,
    title: str = "",
) -> str:
    """Performance-profile figure: P(score > tau) per algorithm over a
    common tau range (reference performance-profile output).

    ``final_scores`` maps label -> per-seed final scores ``[n_seeds]``."""
    plt = _plt()
    allv = np.concatenate([np.asarray(v).reshape(-1) for v in final_scores.values()])
    taus = np.linspace(allv.min(), allv.max(), num_taus)
    fig, ax = plt.subplots(figsize=(6, 4))
    for label, scores in final_scores.items():
        ax.plot(taus, performance_profile(scores, taus), label=label)
    ax.set_xlabel("test return (tau)")
    ax.set_ylabel("fraction of runs > tau")
    ax.set_ylim(-0.02, 1.02)
    if title:
        ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
