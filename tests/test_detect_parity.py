"""End-to-end detection parity against the compiled reference C library.

The reference C library hard-codes T=5, K=540, landmark_n=27, depth=4
(c/jda.c:24-32), so these fixtures use synthetic models of exactly that
geometry (the shipped trained blob was stripped from the snapshot).
The TPU path is designed to be arithmetically identical in float32 (same
op order, truncations, clamps), so we require the exact same box set and
near-identical scores/landmarks.
"""

import numpy as np
import pytest

from jda_tpu import params as P
from jda_tpu import oracle
from jda_tpu.detect import Detector

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference not mounted"
)


def _rand_image(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h // 8 + 2, w // 8 + 2)).astype(np.float32)
    # smooth-ish texture so pixel differences aren't pure salt-and-pepper
    img = np.kron(base, np.ones((8, 8), np.float32))[:h, :w]
    noise = rng.normal(0, 12, (h, w))
    return np.clip(img + noise, 0, 255).astype(np.uint8)


def _run_both(model_seed, img_seed, reject_rate, th, h=96, w=128, tmp_path=None):
    m = P.synthetic_model(
        T=oracle.T,
        K=oracle.K,
        landmark_n=oracle.LANDMARK_N,
        seed=model_seed,
        reject_rate=reject_rate,
    )
    path = str(tmp_path / "m.model")
    P.save_model(m, path, dtype="double")
    img = _rand_image(h, w, img_seed)

    orc = oracle.Oracle(path, dtype="double")
    ob, os_, osc = orc.detect(img, scale=1.25, min_size=24, max_size=-1, th=th)
    del orc

    det = Detector(P.load_model(path, dtype="double"))
    res = det.detect(img, scale=1.25, min_size=24, max_size=-1, th=th)
    return (ob, os_, osc), (res.bboxes, res.shapes, res.scores)


def _assert_match(oracle_out, ours):
    ob, osh, osc = oracle_out
    tb, tsh, tsc = ours
    assert tb.shape == ob.shape, f"box count: ours {len(tb)} vs oracle {len(ob)}"
    np.testing.assert_array_equal(tb, ob)
    np.testing.assert_allclose(tsc, osc, rtol=0, atol=2e-4)
    np.testing.assert_allclose(tsh, osh, rtol=0, atol=2e-3)


def test_parity_no_rejection(tmp_path):
    # every window survives all 2700 carts; strictest test of scoring,
    # regression, final threshold, NMS, and output ordering
    out = _run_both(10, 11, reject_rate=0.0, th=5.0, h=64, w=72, tmp_path=tmp_path)
    _assert_match(*out)
    assert out[0][0].shape[0] > 0  # test actually detected something


def test_parity_with_rejection(tmp_path):
    # realistic cascade behaviour: most windows rejected early
    out = _run_both(12, 13, reject_rate=0.10, th=-10.0, h=96, w=128, tmp_path=tmp_path)
    _assert_match(*out)


def test_parity_multiscale_features(tmp_path):
    """Multi-scale features exercise the h/q borrowed-window quirk.

    NOTE: for multi-scale models the reference C detector is *undefined
    behaviour* near the bottom image edge — ps[1]/ps[2] claim width =
    win_size (c/jda.c:347-352) so reads at h_y + py can run past the
    half/quarter buffer's end into unrelated heap memory.  In-row (x)
    overflow wraps deterministically into the next row, which we reproduce
    via the flat stacked pyramid; past-the-buffer reads cannot be
    reproduced.  The shipped model config has multi_scale=false, so this
    path never runs in practice.  We therefore require parity on all boxes
    except a small bottom-edge tail.
    """
    m = P.synthetic_model(
        T=oracle.T,
        K=oracle.K,
        landmark_n=oracle.LANDMARK_N,
        seed=14,
        multi_scale=True,
        reject_rate=0.05,
    )
    path = str(tmp_path / "m.model")
    P.save_model(m, path, dtype="double")
    img_h, img_w = 192, 128
    img = _rand_image(img_h, img_w, 15)

    # max_size=24 pins win=24; quarter-level reads stay inside the buffer
    # for y <= img_h - 24/0.5 (q) and 24/0.293 (h): safe zone y <= img_h-82.
    # An extra 24 px margin removes NMS coupling with unsafe-band boxes.
    safe_y = img_h - 82 - 24

    orc = oracle.Oracle(path, dtype="double")
    ob, osh, osc = orc.detect(img, scale=1.3, min_size=24, max_size=24, th=-10.0)
    del orc
    det = Detector(P.load_model(path, dtype="double"))
    r = det.detect(img, scale=1.3, min_size=24, max_size=24, th=-10.0)

    om = ob[:, 1] <= safe_y
    tm = r.bboxes[:, 1] <= safe_y
    assert om.sum() > 0
    np.testing.assert_array_equal(r.bboxes[tm], ob[om])
    np.testing.assert_allclose(r.scores[tm], osc[om], atol=2e-4)
    np.testing.assert_allclose(r.shapes[tm], osh[om], atol=2e-3)


def test_detect_batch_matches_single(tmp_path):
    """Batched multi-image detection must equal per-image detection,
    including mixed image sizes (canonical padding + masks)."""
    m = P.synthetic_model(
        T=oracle.T, K=oracle.K, landmark_n=oracle.LANDMARK_N,
        seed=31, reject_rate=0.10,
    )
    det = Detector(m)
    imgs = [
        _rand_image(80, 96, 41),
        _rand_image(64, 88, 42),
    ]
    batch = det.detect_batch(imgs, scale=1.25, th=-5.0)
    for g, rb in zip(imgs, batch):
        rs = det.detect(g, scale=1.25, th=-5.0)
        np.testing.assert_array_equal(rb.bboxes, rs.bboxes)
        np.testing.assert_allclose(rb.scores, rs.scores, atol=1e-5)
        np.testing.assert_allclose(rb.shapes, rs.shapes, atol=1e-4)


def test_detect_batch_sharded_matches_unsharded():
    """detect_batch over an 8-device mesh equals the single-device result."""
    import jax
    from jax.sharding import Mesh

    m = P.synthetic_model(
        T=2, K=32, landmark_n=5, seed=51, reject_rate=0.08
    )
    det = Detector(m)
    imgs = [_rand_image(56, 72, 60 + i) for i in range(3)]  # 3 % 8 != 0: pads
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    sharded = det.detect_batch(imgs, scale=1.3, th=-5.0, mesh=mesh)
    plain = det.detect_batch(imgs, scale=1.3, th=-5.0)
    for a, b in zip(sharded, plain):
        np.testing.assert_array_equal(a.bboxes, b.bboxes)
        np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)


def test_detect_stream_matches_batch():
    """Pipelined streaming detection (detect_stream) must produce exactly
    detect_batch's results — chunking, canonical padding, and the 1-deep
    pipeline are pure throughput mechanics."""
    m = P.synthetic_model(T=3, K=32, landmark_n=5, seed=2, reject_rate=0.2)
    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(
            0, 256, (100 + ((7 * i) % 30), 120 + ((5 * i) % 40))
        ).astype(np.uint8)
        for i in range(11)  # 3 chunks of 4 incl. a ragged tail chunk
    ]
    det = Detector(m)
    # min_size=40: the chunking/padding/pipeline property under test is
    # ladder-length-independent (suite is compile-bound)
    kw = dict(scale=1.3, min_size=40, th=-0.5)
    rs = det.detect_stream(imgs, batch=4, **kw)
    assert len(rs) == len(imgs)
    # reference: per-chunk detect_batch padded to the stream's canonical
    # plane with a dummy image (results for the dummy are discarded)
    Hc = max(g.shape[0] for g in imgs)
    Wc = max(g.shape[1] for g in imgs)
    dummy = np.zeros((Hc, Wc), np.uint8)
    ref = []
    for i in range(0, len(imgs), 4):
        chunk = imgs[i : i + 4]
        padded = chunk + [dummy] * (4 - len(chunk))
        if len(chunk) == 4:
            padded = chunk
        out = det.detect_batch(padded, **kw)
        ref.extend(out[: len(chunk)])
    for a, b in zip(rs, ref):
        assert a.n == b.n
        np.testing.assert_array_equal(a.bboxes, b.bboxes)
        np.testing.assert_allclose(a.scores, b.scores, rtol=0, atol=0)
        np.testing.assert_allclose(a.shapes, b.shapes, rtol=0, atol=0)
