"""Multi-scale method-0 detection through the dense stage-0 filter.

For MULTI-scale models the per-window cv::resize triple of method 0
(cascador.cpp:243-245) can't be skipped — h/q feature pixels read resized
patches.  But because the resize ratio win -> size_s is fixed per scan,
each resized-patch pixel is a fixed 4-tap fixed-point combination of
window pixels (OpenCV INTER_LINEAR 8u arithmetic), so stage 0 still runs
densely over the packed pyramid (ops/dense0.node_tables_ms /
_scale_filter_ms); only stage-0 survivors pay the per-window host resize +
full-cascade tail.  The path must equal _detect_m0_host EXACTLY — same
rects, scores, shapes, and window statistics — which in turn requires a
bit-exact software model of cv2.resize (ops/resize.resize_bilinear_cv_exact).
"""

import numpy as np
import pytest

from jda_tpu.config import Config
from jda_tpu import params as P
from jda_tpu.cascador import CppDetector, DetectionStatistic
from jda_tpu.ops.resize import resize_bilinear_cv_exact


def _cfg(**kw):
    base = dict(
        T=2,
        K=16,
        landmark_n=5,
        tree_depth=4,
        img_o_size=32,
        img_h_size=24,
        img_q_size=16,
        fddb_minimum_size=24,
        fddb_step=4,
        fddb_scale_factor=1.3,
        fddb_overlap=0.3,
        fddb_nms=True,
        fddb_detect_method=0,
        left_pupils=(0,),
        right_pupils=(1,),
    )
    base.update(kw)
    return Config(**base)


def _image(seed=4, h=150, w=190):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h // 8 + 2, w // 8 + 2)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), np.float32))[:h, :w]
    return np.clip(img + rng.normal(0, 10, (h, w)), 0, 255).astype(np.uint8)


def test_resize_cv_exact_bitwise():
    """resize_bilinear_cv_exact == cv2.resize (8u INTER_LINEAR) bit-for-bit
    on the detection-relevant size pairs and on odd shrink chains."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for src_h, src_w, dst in [
        (32, 32, (32, 32)),
        (32, 32, (24, 24)),
        (32, 32, (16, 16)),
        (48, 48, (36, 36)),
        (48, 48, (24, 24)),
        (150, 190, (115, 146)),
        (37, 53, (29, 40)),
    ]:
        img = rng.integers(0, 256, (src_h, src_w), dtype=np.uint8)
        got = resize_bilinear_cv_exact(img, dst[1], dst[0])
        want = cv2.resize(img, (dst[1], dst[0]))
        np.testing.assert_array_equal(got, want, err_msg=f"{src_h}x{src_w}->{dst}")


def test_m0_dense_ms_matches_host():
    """Dense multi-scale stage-0 + survivor tail == per-window host loop,
    bit-exact including DetectionStatistic."""
    c = _cfg()
    m = P.synthetic_model(
        T=c.T,
        K=c.K,
        landmark_n=c.landmark_n,
        tree_depth=c.tree_depth,
        seed=13,
        multi_scale=True,
        reject_rate=0.08,
    )
    assert (np.asarray(m.scale) != 0).any()  # genuinely multi-scale
    det = CppDetector(m, c)
    assert not det._m0_fast_applicable()  # fused fast path gated off
    assert det._m0_dense_ms_applicable()
    img = _image(seed=7)

    st_d = DetectionStatistic()
    rd, sd, shd = det._detect_m0_dense_ms(img, st_d)
    st_h = DetectionStatistic()
    rh, sh_, shh = det._detect_m0_host(img, st_h)

    np.testing.assert_array_equal(rd, rh)
    np.testing.assert_allclose(sd, sh_, rtol=0, atol=0)
    np.testing.assert_allclose(shd, shh, rtol=0, atol=0)
    assert st_d.patch_n == st_h.patch_n
    assert st_d.face_patch_n == st_h.face_patch_n
    assert st_d.nonface_patch_n == st_h.nonface_patch_n
    assert st_d.cart_gothrough_n == st_h.cart_gothrough_n
    assert st_d.patch_n > 500  # several pyramid levels actually scanned
    assert st_d.face_patch_n > 0  # tail actually exercised


def test_m0_dense_ms_detect_end_to_end():
    """detect() routes multi-scale method-0 through the dense path and the
    result (post NMS + relocation) equals the host path's."""
    import os

    c = _cfg()
    m = P.synthetic_model(
        T=c.T,
        K=c.K,
        landmark_n=c.landmark_n,
        tree_depth=c.tree_depth,
        seed=5,
        multi_scale=True,
        reject_rate=0.10,
    )
    det = CppDetector(m, c)
    img = _image(seed=9, h=120, w=140)
    r1, s1, sh1, st1 = det.detect(img)
    os.environ["JDA_TPU_M0_DENSE_MS"] = "0"
    try:
        r2, s2, sh2, st2 = det.detect(img)
    finally:
        os.environ.pop("JDA_TPU_M0_DENSE_MS")
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(s1, s2, rtol=0, atol=0)
    np.testing.assert_allclose(sh1, sh2, rtol=0, atol=0)
    assert st1.patch_n == st2.patch_n
    assert st1.cart_gothrough_n == st2.cart_gothrough_n
