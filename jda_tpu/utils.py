"""Logging, timers, and evaluation utilities (reference common.cpp)."""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Sequence

import numpy as np


def log(msg: str) -> None:
    """Timestamped stdout log (LOG, common.cpp:17-28)."""
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    print(f"[{stamp}] {msg}", flush=True)


@contextmanager
def timer(label: str):
    """Scoped wall-clock timer (TIMER_BEGIN/END, common.hpp:24-50)."""
    t0 = time.perf_counter()
    yield
    log(f"{label}: {time.perf_counter() - t0:.4f} s")


def calc_mean_error(
    gt_shapes: np.ndarray,  # [N, 2L]
    current_shapes: np.ndarray,  # [N, 2L]
    left_pupils: Sequence[int],
    right_pupils: Sequence[int],
) -> float:
    """Mean landmark error normalized by inter-pupil distance
    (calcMeanError, common.cpp:41-77): pupil position = mean of the
    configured landmark ids; per-sample error = mean over landmarks of
    euclidean distance / pupil distance; averned over samples."""
    n, L2 = gt_shapes.shape
    L = L2 // 2
    gx = gt_shapes[:, 0::2]
    gy = gt_shapes[:, 1::2]
    cx = current_shapes[:, 0::2]
    cy = current_shapes[:, 1::2]
    lp = np.asarray(left_pupils)
    rp = np.asarray(right_pupils)
    lpx = gx[:, lp].mean(1)
    lpy = gy[:, lp].mean(1)
    rpx = gx[:, rp].mean(1)
    rpy = gy[:, rp].mean(1)
    pupil_d = np.sqrt((lpx - rpx) ** 2 + (lpy - rpy) ** 2)
    dist = np.sqrt((gx - cx) ** 2 + (gy - cy) ** 2).mean(1)
    return float((dist / np.maximum(pupil_d, 1e-12)).mean())


def draw_density_graph(
    pos_scores: np.ndarray, neg_scores: np.ndarray, bins: int = 64
) -> str:
    """ASCII score-density plot of pos vs neg (draw_density_graph,
    btcart.cpp:19-102): one row per distribution, density by character."""
    lo = min(pos_scores.min(), neg_scores.min())
    hi = max(pos_scores.max(), neg_scores.max())
    if hi <= lo:
        hi = lo + 1.0
    chars = " .:-=+*#%@"
    rows = []
    for name, s in (("pos", pos_scores), ("neg", neg_scores)):
        h, _ = np.histogram(s, bins=bins, range=(lo, hi))
        d = h / max(h.max(), 1)
        rows.append(
            name + " |" + "".join(chars[int(v * (len(chars) - 1))] for v in d) + "|"
        )
    return "\n".join(rows) + f"\n     [{lo:.3f}, {hi:.3f}]"
