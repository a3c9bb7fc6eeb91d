"""MXU canvas tail (ops/mxu_tail.py + fused v2): bit-parity vs the gather
paths.

The canvas tail replaces the survivor cascade's XLA pixel gathers with
one-hot MXU contractions over per-lane window canvases; every value it
produces must be bit-identical to cascade.carts_descend (same float32
coordinate arithmetic, trunc/round duality of c/jda.c:375-381 vs
data.cpp:48-51, same score chain and exact sequential regression).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from jda_tpu import params as P
from jda_tpu.detect import Detector
from jda_tpu.ops import cascade as C
from jda_tpu.ops import fused as F
from jda_tpu.ops import mxu_tail as MT


def _windows_and_geom(rng, B, H, W, n_lanes, S):
    """Random lanes: (b, x, y, win<=S) + v1 gather geometry."""
    b_idx = rng.integers(0, B, n_lanes).astype(np.int32)
    win = rng.integers(S // 2, S + 1, n_lanes).astype(np.int32)
    x = (rng.random(n_lanes) * (W - win)).astype(np.int32)
    y = (rng.random(n_lanes) * (H - win)).astype(np.int32)
    base_o = (b_idx * (H * W) + y * W + x).astype(np.int32)
    base = np.stack([base_o] * 3, axis=1)
    stride = np.full((n_lanes, 3), W, np.int32)
    pw = np.stack([win] * 3, axis=1)
    return b_idx, x, y, win, base, stride, pw


@pytest.mark.parametrize("rounding", [False, True])
def test_descend_canvas_matches_gather(rounding):
    rng = np.random.default_rng(5)
    B, H, W, S, N = 2, 96, 128, 48, 64
    m = P.synthetic_model(T=1, K=24, landmark_n=9, tree_depth=4, seed=2)
    dev = m.device_arrays(np.float32)
    chunk = C.stage_params(dev, 0)

    imgs = rng.integers(0, 256, (B, H, W)).astype(np.int32)
    flat = jnp.asarray(imgs.reshape(-1))
    b_idx, x, y, win, base, stride, pw = _windows_and_geom(rng, B, H, W, N, S)

    # per-lane shapes: perturbed mean shape (post-regression state)
    shapes = (
        m.mean_shape[None, :].astype(np.float32)
        + rng.normal(0, 0.03, (N, m.landmark_dim)).astype(np.float32)
    )

    state = C.init_state(
        N,
        dev["mean_shape"],
        jnp.asarray(base),
        jnp.asarray(stride),
        jnp.asarray(pw),
        jnp.asarray(pw),
        jnp.ones(N, bool),
    )
    state["shape"] = jnp.asarray(shapes)
    leaves_g, b_g = C.carts_descend(
        chunk, flat, state, depth=4, rounding=rounding, single_scale=True
    )

    canvas = MT.canvas_from_windows(
        flat, jnp.asarray(b_idx), jnp.asarray(x), jnp.asarray(y), H, W, S
    )
    leaves_c, b_c = MT.descend_canvas(
        chunk,
        canvas,
        jnp.asarray(win),
        jnp.asarray(shapes),
        depth=4,
        rounding=rounding,
        cart_block=7,  # force the cart-chunking path too
    )
    np.testing.assert_array_equal(np.asarray(leaves_g), np.asarray(leaves_c))
    np.testing.assert_array_equal(np.asarray(b_g), np.asarray(b_c))


def test_canvas_rows_and_compact_match_gather():
    """canvas_rows (row-span slices) and compact_canvas (one-hot MXU
    compaction) must agree with the element-gather reference on every
    in-bounds pixel (canvas cols/rows < win; padding is never read)."""
    rng = np.random.default_rng(17)
    B, H, W, S, N = 3, 64, 96, 32, 40
    imgs = rng.integers(0, 256, (B, H, W)).astype(np.int32)
    flat = jnp.asarray(imgs.reshape(-1))
    b_idx, x, y, win, *_ = _windows_and_geom(rng, B, H, W, N, S)

    ref = np.asarray(
        MT.canvas_from_windows(
            flat, jnp.asarray(b_idx), jnp.asarray(x), jnp.asarray(y), H, W, S
        )
    )
    rows = np.asarray(
        MT.canvas_rows(
            flat, jnp.asarray(b_idx), jnp.asarray(x), jnp.asarray(y), H, W, S
        )
    )
    for n in range(N):
        w = int(win[n])
        np.testing.assert_array_equal(ref[n, :w, :w], rows[n, :w, :w])

    sel = rng.integers(0, N, 16).astype(np.int32)
    np.testing.assert_array_equal(
        ref[sel], np.asarray(MT.compact_canvas(jnp.asarray(ref), jnp.asarray(sel)))
    )


def test_group_scales_partition():
    _, _, _, scales = __import__(
        "jda_tpu.detect", fromlist=["enumerate_windows"]
    ).enumerate_windows(400, 300, 1.25, 24, 300)
    groups = F.group_scales(tuple(scales))
    # contiguous, exhaustive partition
    assert groups[0]["si0"] == 0 and groups[-1]["si1"] == len(scales)
    for a, b in zip(groups[:-1], groups[1:]):
        assert a["si1"] == b["si0"] and a["w1"] == b["w0"]
    # bucket invariants: every scale fits its bucket; gather group > 256
    for g in groups:
        wins = [scales[i][0] for i in range(g["si0"], g["si1"])]
        if g["S"] is None:
            assert all(w > 256 for w in wins)
        else:
            assert all(w <= g["S"] for w in wins)


def _detect_both(model, grays, **kw):
    """Run detect_batch under both tail implementations."""
    outs = {}
    for tail in ("gather", "mxu"):
        os.environ["JDA_TPU_TAIL"] = tail
        try:
            det = Detector(model)
            outs[tail] = det.detect_batch(grays, **kw)
        finally:
            os.environ.pop("JDA_TPU_TAIL", None)
    return outs["gather"], outs["mxu"]


@pytest.mark.parametrize("canvas_mode", ["gather", "rows"])
def test_fused_v2_matches_v1_batch(canvas_mode):
    rng = np.random.default_rng(11)
    m = P.synthetic_model(
        T=3, K=12, landmark_n=9, tree_depth=4, seed=4, reject_rate=0.3
    )
    grays = [
        rng.integers(0, 256, (96, 128)).astype(np.uint8),
        rng.integers(0, 256, (80, 112)).astype(np.uint8),  # mixed dims
    ]
    os.environ["JDA_TPU_CANVAS"] = canvas_mode
    try:
        # min_size=40 trims the ladder to 4 scales — the v2-vs-v1 parity
        # property does not need the full 24.. ladder (compile-bound)
        ref, new = _detect_both(m, grays, th=-5.0, min_size=40)
    finally:
        os.environ.pop("JDA_TPU_CANVAS", None)
    assert sum(r.n for r in ref) > 0, "degenerate fixture: nothing detected"
    for r, v in zip(ref, new):
        assert r.n == v.n
        np.testing.assert_array_equal(r.bboxes, v.bboxes)
        np.testing.assert_array_equal(r.scores, v.scores)
        np.testing.assert_array_equal(r.shapes, v.shapes)


def test_fused_v2_with_gather_group():
    """A ladder reaching past win=256 exercises the mixed canvas+gather
    grouping."""
    rng = np.random.default_rng(13)
    m = P.synthetic_model(
        T=2, K=8, landmark_n=9, tree_depth=4, seed=6, reject_rate=0.25
    )
    grays = [rng.integers(0, 256, (300, 320)).astype(np.uint8)]
    # min_size=110 keeps the ladder short (110..266) while still crossing
    # the 256 canvas-bucket limit — the property under test — instead of
    # compiling/running the full 24.. ladder (suite is compile-bound)
    ref, new = _detect_both(m, grays, th=-5.0, min_size=110)
    for r, v in zip(ref, new):
        assert r.n == v.n
        np.testing.assert_array_equal(r.bboxes, v.bboxes)
        np.testing.assert_array_equal(r.scores, v.scores)
        np.testing.assert_array_equal(r.shapes, v.shapes)
