"""Hard-negative factory difficulty headroom (d in (1, 2]).

Round 4's flagship run saturated the adaptive difficulty ladder at 1.0
and stages 1-4 truncated 9-23 of 540 carts to mining exhaustion
(VERDICT r4 weak #3; the reference trains all K carts unconditionally,
btcart.cpp:132).  The (1, 2] band maps to harder-still composites; every
output must keep the labeled-negative contract.
"""

import numpy as np
import pytest

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.train_flagship import (  # noqa: E402
    _d2,
    _window_face_iou,
    make_hard_canvas,
    make_near_miss,
)


def test_d2_flat_below_one_then_lerps():
    assert _d2(0.026, 0.022, 0.0) == pytest.approx(0.026)
    assert _d2(0.026, 0.022, 1.0) == pytest.approx(0.026)
    assert _d2(0.026, 0.022, 1.5) == pytest.approx(0.024)
    assert _d2(0.026, 0.022, 2.0) == pytest.approx(0.022)
    assert _d2(0.026, 0.022, 5.0) == pytest.approx(0.022)  # clamped


@pytest.mark.parametrize("difficulty", [0.0, 1.0, 1.5, 2.0])
def test_near_miss_contract_across_band(difficulty):
    rng = np.random.default_rng(3)
    for mode in range(5):
        for _ in range(6):
            p = make_near_miss(rng, 48, difficulty, mode=mode)
            assert p.shape == (48, 48) and p.dtype == np.uint8


@pytest.mark.parametrize("difficulty", [1.2, 2.0])
def test_hard_canvas_extended_band(difficulty):
    rng = np.random.default_rng(7)
    saw_any = saw_bound = False
    for _ in range(30):
        canvas, (fx, fy, R), any_win = make_hard_canvas(rng, 48, difficulty)
        assert canvas.ndim == 2 and canvas.shape[0] == canvas.shape[1]
        assert canvas.shape[0] == 3 * R and canvas.dtype == np.uint8
        saw_any |= any_win
        saw_bound |= not any_win
    assert saw_any and saw_bound  # both slot kinds present


def test_near_miss_geometry_modes_stay_negative_at_max_difficulty():
    """Modes 0/1/4 guarantee the emitted window has IoU < 0.48 with the
    face box; the d=2 parameters must not break that."""
    rng = np.random.default_rng(11)
    # re-derive the guarantee through the public surface: the factory
    # clamps geometry internally, so just smoke a large sample for
    # crashes/NaNs and spot-check the IoU helper consistency
    for mode in (0, 1, 4):
        for _ in range(20):
            p = make_near_miss(rng, 48, 2.0, mode=mode)
            assert p.shape == (48, 48)
    # the helper itself: a window centered far off the face is negative
    assert _window_face_iou(200, 200, 50, 50, 50, 50) < 0.48
