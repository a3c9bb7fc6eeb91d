"""Native C library parity: our fresh C implementation must produce
bit-identical detections to the reference C library and to the TPU path."""

import numpy as np
import pytest

from jda_tpu import params as P
from jda_tpu import oracle
from jda_tpu import native
from jda_tpu.detect import Detector


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h // 8 + 2, w // 8 + 2)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), np.float32))[:h, :w]
    return np.clip(img + rng.normal(0, 12, (h, w)), 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    m = P.synthetic_model(
        T=oracle.T,
        K=oracle.K,
        landmark_n=oracle.LANDMARK_N,
        seed=21,
        reject_rate=0.10,
    )
    path = str(d / "m.model")
    P.save_model(m, path, dtype="double")
    return m, path, _img(96, 128, 6)


def test_native_builds():
    assert native.build().endswith(".so")


@pytest.mark.skipif(not oracle.available(), reason="reference not mounted")
def test_native_matches_reference_oracle(setup):
    m, path, img = setup
    ours = native.NativeDetector(path, dtype="double")
    ref = oracle.Oracle(path, dtype="double")
    nb, nsh, nsc = ours.detect(img, th=-5.0)
    ob, osh, osc = ref.detect(img, th=-5.0)
    np.testing.assert_array_equal(nb, ob)
    np.testing.assert_array_equal(nsc, osc)  # same float ops -> bit equal
    np.testing.assert_array_equal(nsh, osh)


def test_native_matches_tpu_detector(setup):
    m, path, img = setup
    ours = native.NativeDetector(path, dtype="double")
    nb, nsh, nsc = ours.detect(img, th=-5.0)
    det = Detector(m)
    res = det.detect(img, th=-5.0)
    np.testing.assert_array_equal(nb, res.bboxes)
    np.testing.assert_allclose(nsc, res.scores, atol=2e-4)
    np.testing.assert_allclose(nsh, res.shapes, atol=2e-3)


@pytest.mark.skipif(not oracle.available(), reason="reference not mounted")
def test_native_float_serialization_interop(setup, tmp_path):
    """Our float serialization loads in the reference parser and matches."""
    m, path, img = setup
    ours = native.NativeDetector(path, dtype="double")
    fpath = str(tmp_path / "m.fmodel")
    ours.serialize_float(fpath)
    ref = oracle.Oracle(fpath, dtype="float")
    rb, rsh, rsc = ref.detect(img, th=-5.0)
    nb, nsh, nsc = ours.detect(img, th=-5.0)
    np.testing.assert_array_equal(nb, rb)
    np.testing.assert_array_equal(nsc, rsc)
