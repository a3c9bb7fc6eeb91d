"""Stage-0 LBF emission (ops/dense0.py emit_lbf + fused s0_lbf): the
dense filter's packed leaf words must reproduce carts_descend's stage-0
leaf indices exactly, and detection through the fused pipeline must be
bit-identical with the feature on or off (the words replace the tail's
stage-0 re-descent — same leaves, same regression, same everything).
"""

import os

import numpy as np
import jax.numpy as jnp

from jda_tpu import params as P
from jda_tpu.detect import Detector, enumerate_windows
from jda_tpu.ops import cascade as C
from jda_tpu.ops import dense0 as D0
from jda_tpu.ops import fused as F


def _detect_s0lbf(model, grays, flag, **kw):
    os.environ["JDA_TPU_S0LBF"] = flag
    try:
        det = Detector(model)
        return det.detect_batch(grays, **kw)
    finally:
        os.environ.pop("JDA_TPU_S0LBF", None)


def test_dense_lbf_words_match_descend():
    """Unpacked dense leaf words == carts_descend leaves at every window
    (dead windows included: the dense filter computes full paths)."""
    rng = np.random.default_rng(3)
    H, W, win, step = 64, 96, 24, 2
    m = P.synthetic_model(T=1, K=21, landmark_n=9, tree_depth=4, seed=9)
    dev = m.device_arrays(np.float32)
    host0 = {
        "lmk1": np.asarray(dev["lmk1"][0]),
        "lmk2": np.asarray(dev["lmk2"][0]),
        "off1": np.asarray(dev["off1"][0]),
        "off2": np.asarray(dev["off2"][0]),
        "feat_th": np.asarray(dev["feat_th"][0]),
        "leaf_scores": np.asarray(dev["leaf_scores"][0]),
        "mean": np.asarray(dev["mean"][0]),
        "std": np.asarray(dev["std"][0]),
        "cart_th": np.asarray(dev["cart_th"][0]),
    }
    ms32 = m.mean_shape.astype(np.float32)
    tab = D0.node_tables(ms32, host0, win, step)
    ny = (H - win) // step + 1
    nx = (W - win) // step + 1
    imgs = rng.integers(0, 256, (2, H, W)).astype(np.int32)

    out = D0._scale_filter(
        jnp.asarray(imgs),
        {k: jnp.asarray(v) for k, v in tab.items()},
        step=step,
        ny=ny,
        nx=nx,
        depth=4,
        emit_lbf=True,
    )
    score, alive, nvis, lbf = out
    assert lbf.shape == (2, ny, nx, D0.lbf_words(21))

    # reference: gather-path descent on every window of the grid
    ys, xs = np.meshgrid(
        np.arange(ny) * step, np.arange(nx) * step, indexing="ij"
    )
    N = ny * nx
    for b in range(2):
        base_o = (b * H * W + ys.reshape(-1) * W + xs.reshape(-1)).astype(
            np.int32
        )
        base = np.stack([base_o] * 3, axis=1)
        stride = np.full((N, 3), W, np.int32)
        pw = np.full((N, 3), win, np.int32)
        state = C.init_state(
            N,
            dev["mean_shape"],
            jnp.asarray(base),
            jnp.asarray(stride),
            jnp.asarray(pw),
            jnp.asarray(pw),
            jnp.ones(N, bool),
        )
        leaves_ref, _ = C.carts_descend(
            C.stage_params(dev, 0),
            jnp.asarray(imgs.reshape(-1)),
            state,
            depth=4,
            rounding=False,
            single_scale=True,
        )
        got = F.unpack_lbf(jnp.asarray(lbf[b]).reshape(N, -1), 21)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(leaves_ref))

    # score/alive parity with the non-emitting filter (block size changes
    # with emit_lbf; results must not)
    s2, a2, nv2 = D0._scale_filter(
        jnp.asarray(imgs),
        {k: jnp.asarray(v) for k, v in tab.items()},
        step=step,
        ny=ny,
        nx=nx,
        depth=4,
    )
    np.testing.assert_array_equal(np.asarray(score), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(alive), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(nvis), np.asarray(nv2))


def test_detect_batch_s0lbf_parity():
    """End-to-end fused detection: JDA_TPU_S0LBF on/off bit-parity."""
    rng = np.random.default_rng(11)
    m = P.synthetic_model(
        T=3, K=12, landmark_n=9, tree_depth=4, seed=4, reject_rate=0.3
    )
    grays = [
        rng.integers(0, 256, (96, 128)).astype(np.uint8),
        rng.integers(0, 256, (80, 112)).astype(np.uint8),
    ]
    ref = _detect_s0lbf(m, grays, "0", th=-5.0)
    new = _detect_s0lbf(m, grays, "1", th=-5.0)
    assert sum(r.n for r in ref) > 0, "degenerate fixture: nothing detected"
    for r, v in zip(ref, new):
        assert r.n == v.n
        np.testing.assert_array_equal(r.bboxes, v.bboxes)
        np.testing.assert_array_equal(r.scores, v.scores)
        np.testing.assert_array_equal(r.shapes, v.shapes)


def test_detect_batch_s0lbf_parity_v2_groups():
    """Same parity through the grouped (fn2) program — canvas + gather
    groups both consume the packed words."""
    rng = np.random.default_rng(13)
    m = P.synthetic_model(
        T=2, K=8, landmark_n=9, tree_depth=4, seed=6, reject_rate=0.25
    )
    grays = [rng.integers(0, 256, (300, 320)).astype(np.uint8)]
    os.environ["JDA_TPU_TAIL"] = "mxu"
    try:
        # min_size=110: ladder 110..266 still spans canvas buckets AND the
        # >256 gather group (the property) at a fraction of the compile
        ref = _detect_s0lbf(m, grays, "0", th=-5.0, min_size=110)
        new = _detect_s0lbf(m, grays, "1", th=-5.0, min_size=110)
    finally:
        os.environ.pop("JDA_TPU_TAIL", None)
    for r, v in zip(ref, new):
        assert r.n == v.n
        np.testing.assert_array_equal(r.bboxes, v.bboxes)
        np.testing.assert_array_equal(r.scores, v.scores)
        np.testing.assert_array_equal(r.shapes, v.shapes)
