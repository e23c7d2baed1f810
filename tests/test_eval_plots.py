"""rliable presentation layer: series loading, alignment, and figure
outputs (reference ``evaluation/rliable_evaluation_hl.py:55-218``)."""

import os

import numpy as np
import pytest

from tianshou_tpu.evaluation.plots import (
    align_series,
    load_test_return_series,
    plot_iqm_curves,
    plot_performance_profiles,
)


def test_align_series_interpolates_common_grid():
    s1 = [(0, 0.0), (10, 10.0), (20, 20.0)]
    s2 = [(5, 0.0), (15, 30.0), (25, 30.0)]
    steps, scores = align_series([s1, s2], num_points=3)
    np.testing.assert_allclose(steps, [5, 12.5, 20])
    np.testing.assert_allclose(scores[0], [5, 12.5, 20])
    np.testing.assert_allclose(scores[1], [0, 22.5, 30])


def test_load_series_roundtrip_through_logger(tmp_path):
    from tianshou_tpu.utils.logger import TensorboardLogger

    d = os.path.join(tmp_path, "run")
    logger = TensorboardLogger(d)
    for step, val in [(100, 1.0), (200, 3.0), (300, 5.0)]:
        logger.log_test_data({"returns_mean": val}, step)
    logger.finalize()
    series = load_test_return_series(d)
    assert series == [(100, 1.0), (200, 3.0), (300, 5.0)]


def test_plot_outputs_are_written(tmp_path):
    pytest.importorskip("matplotlib")
    rng = np.random.default_rng(0)
    steps = np.linspace(0, 1e6, 32)
    results = {
        "sac": (steps, rng.normal(10, 1, size=(5, 32)).cumsum(axis=1)),
        "ppo": (steps, rng.normal(8, 1, size=(5, 32)).cumsum(axis=1)),
    }
    p1 = plot_iqm_curves(
        results, os.path.join(tmp_path, "iqm.png"), title="t", n_boot=50
    )
    assert os.path.getsize(p1) > 1000
    finals = {k: v[1][:, -1] for k, v in results.items()}
    p2 = plot_performance_profiles(
        finals, os.path.join(tmp_path, "profile.png")
    )
    assert os.path.getsize(p2) > 1000
