"""Non-maximum suppression, reproducing both reference variants.

The survivor set after the cascade is tiny (tens of boxes), so NMS runs on
host in numpy; its output order is part of the API contract with the
reference so we match it exactly:

  * `nms_c`: the C library's greedy NMS (/root/reference/c/jda.c:237-316).
    Boxes are squares (x, y, size); score-descending greedy suppression with
    IoU > overlap (strict); **output keeps the original candidate order**
    (the final move loop iterates i = 0..n-1 over the input order,
    c/jda.c:295-301).
  * `nms_cpp`: the C++ multimap variant (src/jda/cascador.cpp:387-429) used
    by `jda test/fddb`; rectangles may be non-square; output is in pick
    order (score descending), and the suppression loop also erases the
    current maximum itself.
"""

from __future__ import annotations

import numpy as np


def nms_c(bboxes: np.ndarray, scores: np.ndarray, overlap: float = 0.3) -> np.ndarray:
    """Greedy square-box NMS; returns indices of kept boxes in input order."""
    n = len(scores)
    if n == 0:
        return np.zeros((0,), np.int64)
    order = np.argsort(-scores, kind="stable")
    flag = np.ones(n, bool)
    x = bboxes[:, 0].astype(np.int64)
    y = bboxes[:, 1].astype(np.int64)
    sz = bboxes[:, 2].astype(np.int64)
    area = sz * sz
    for i in range(n - 1):
        k1 = order[i]
        if not flag[k1]:
            continue
        rest = order[i + 1 :]
        rest = rest[flag[rest]]
        if rest.size == 0:
            continue
        x1 = np.maximum(x[k1], x[rest])
        y1 = np.maximum(y[k1], y[rest])
        x2 = np.minimum(x[k1] + sz[k1], x[rest] + sz[rest])
        y2 = np.minimum(y[k1] + sz[k1], y[rest] + sz[rest])
        w = np.maximum(0, x2 - x1)
        h = np.maximum(0, y2 - y1)
        inter = (w * h).astype(np.float32)
        ov = inter / (area[k1] + area[rest] - w * h).astype(np.float32)
        flag[rest[ov > overlap]] = False
    return np.flatnonzero(flag)


def nms_cpp(rects: np.ndarray, scores: np.ndarray, overlap: float = 0.3) -> np.ndarray:
    """C++ multimap NMS; rects [n,4] = (x, y, w, h); returns picked indices
    in score-descending pick order (cascador.cpp:387-429)."""
    n = len(scores)
    if n == 0:
        return np.zeros((0,), np.int64)
    x = rects[:, 0].astype(np.float64)
    y = rects[:, 1].astype(np.float64)
    w = rects[:, 2].astype(np.float64)
    h = rects[:, 3].astype(np.float64)
    areas = w * h
    # std::multimap orders by key ascending; equal scores keep insertion
    # order, and map.rbegin() picks the *last* inserted among maxima.
    order = list(np.argsort(scores, kind="stable"))
    picked = []
    alive = np.ones(n, bool)
    while order:
        last = order[-1]
        picked.append(last)
        survivors = []
        for idx in order:
            x1 = max(x[idx], x[last])
            y1 = max(y[idx], y[last])
            x2 = min(x[idx] + w[idx], x[last] + w[last])
            y2 = min(y[idx] + h[idx], y[last] + h[last])
            ww = max(0.0, x2 - x1)
            hh = max(0.0, y2 - y1)
            ov = ww * hh / (areas[idx] + areas[last] - ww * hh)
            if ov <= overlap:
                survivors.append(idx)
        order = survivors
        alive[last] = False
    return np.asarray(picked, np.int64)
