"""Ladder-level coverage for Detector(rounding=True).

The C API truncates feature pixel coordinates (c/jda.c:375-381) while the
C++ training/fddb path rounds (data.cpp:48-51); Detector(rounding=True)
runs the full jdaDetect window ladder (c/jda.c:331-333) under the C++
rounding semantics — the combination synthetic-/flagship-trained models
need (scripts/eval_synth_scenes.py uses it).  Until now that combination
was only tested at the single-window cascade_full level; here the whole
ladder rides both executable paths and must agree EXACTLY:

  * fused fast path (dense stage-0 filter + compaction + MXU canvas tail,
    JDA_TPU_FUSED=1) vs
  * gather fallback (per-stage masked gathers, JDA_TPU_FUSED=0),

which are independent programs sharing only the model arrays.  The gather
fallback itself is pinned to a numpy per-window Validate port in
tests/test_st_detect.py, so exact agreement here transitively pins the
fused rounding ladder to the reference semantics.
"""

import os

import numpy as np
import pytest

from jda_tpu import params as P
from jda_tpu.detect import Detector


def _image(seed=4, h=120, w=160):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h // 8 + 2, w // 8 + 2)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), np.float32))[:h, :w]
    return np.clip(img + rng.normal(0, 10, (h, w)), 0, 255).astype(np.uint8)


def _model(seed=23, reject_rate=0.1):
    return P.synthetic_model(
        T=3, K=32, landmark_n=7, tree_depth=4, seed=seed, reject_rate=reject_rate
    )


@pytest.mark.parametrize("seed", [23, 57])
def test_rounding_ladder_fused_matches_gather(seed):
    m = _model(seed=seed)
    img = _image(seed=seed + 1)

    old = os.environ.get("JDA_TPU_FUSED")
    try:
        # min_size=40 -> 5-scale ladder: the fused-vs-gather agreement
        # property is scale-count-independent (suite is compile-bound)
        os.environ["JDA_TPU_FUSED"] = "1"
        rf = Detector(m, rounding=True).detect(img, th=-1.0, min_size=40)
        os.environ["JDA_TPU_FUSED"] = "0"
        rg = Detector(m, rounding=True).detect(img, th=-1.0, min_size=40)
    finally:
        if old is None:
            os.environ.pop("JDA_TPU_FUSED", None)
        else:
            os.environ["JDA_TPU_FUSED"] = old

    assert rf.n > 0, "fixture found no boxes; weaken reject_rate"
    assert rf.n == rg.n
    np.testing.assert_array_equal(rf.bboxes, rg.bboxes)
    np.testing.assert_allclose(rf.scores, rg.scores, rtol=0, atol=2e-4)
    np.testing.assert_allclose(rf.shapes, rg.shapes, rtol=0, atol=2e-4)


def test_rounding_changes_decisions():
    """The two semantics must actually diverge on a synthetic model —
    otherwise the parity above tests nothing rounding-specific."""
    m = _model(seed=23)
    img = _image(seed=24)
    rr = Detector(m, rounding=True).detect(img, th=-1.0, min_size=40)
    rt = Detector(m, rounding=False).detect(img, th=-1.0, min_size=40)
    same = rr.n == rt.n and np.array_equal(rr.bboxes, rt.bboxes) and np.allclose(
        rr.scores, rt.scores, atol=1e-6
    )
    assert not same
