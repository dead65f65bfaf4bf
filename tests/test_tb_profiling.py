"""TB helpers + profiling utilities."""

import time

import numpy as np

from cotr_tpu.training.tb import TensorboardDatapack, draw_corrs
from cotr_tpu.utils.profiling import PhaseTimer


def test_draw_corrs_renders_lines():
    canvases = np.zeros((2, 256, 512, 3), np.float32)
    corrs = np.array([[[0.1, 0.5, 0.8, 0.5]], [[0.25, 0.25, 0.75, 0.75]]])
    out = draw_corrs(canvases, corrs, color=(255, 0, 0))
    assert out.shape == (2, 256, 512, 3)
    assert out.dtype == np.uint8
    # the line endpoints are painted
    assert (out[0, 128, int(0.1 * 512)] == [255, 0, 0]).all()
    assert (out[0, 128, int(0.8 * 512)] == [255, 0, 0]).all()
    # pixels off the line stay (denormalized) background
    assert not (out[0, 10, 10] == [255, 0, 0]).all()


def test_datapack_accumulates():
    p = TensorboardDatapack()
    p.set_iteration(7)
    p.add_scalar({"a": 1.0})
    p.add_scalar({"b": 2.0})
    p.add_histogram({"h": np.zeros(4)})
    assert p.iteration == 7 and set(p.scalar) == {"a", "b"}


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("x"):
        time.sleep(0.01)
    with t.phase("x"):
        pass
    assert t.counts["x"] == 2
    assert t.totals["x"] >= 0.01
    assert "x:" in t.report()
