"""Survivor-lane budget lifecycle: overflow growth, post-stream trim,
and the persistent budget store.

The fused program's lane budgets are static shapes (ops/fused.py); the
host grows them on overflow (counts reported by the program), shrinks
them to the observed high-water mark after a stream pass, and persists
the settled values next to the XLA compilation cache so later processes
compile the settled program directly.  Detection results must be
invariant to all of it (compaction only re-packs lanes).
"""

import os

import numpy as np
import pytest

import jda_tpu
from jda_tpu.detect import Detector, _grown_budgets


def test_grown_budgets_propagates_ratio_downstream():
    b = (3584, 2304, 1536, 1024)
    g = _grown_budgets(b, (9000, 2304, 1536, 1024))
    # overflowed entry jumps to counts*5/4 (256-rounded)
    assert g[0] == (9000 * 5 // 4 + 255) // 256 * 256
    # downstream entries scale by the same ratio: their counts were
    # measured under the clipped upstream population
    assert g[1] > b[1] and g[2] > b[2] and g[3] > b[3]


def test_grown_budgets_noop_when_under():
    b = (3584, 2304, 1536, 1024)
    assert _grown_budgets(b, (100, 200, 300, 400)) == b


def test_grown_budgets_mid_entry_overflow():
    b = (1024, 512, 256, 256)
    g = _grown_budgets(b, (900, 700, 200, 100))
    assert g[0] == 1024  # untouched upstream
    assert g[1] == (700 * 5 // 4 + 255) // 256 * 256
    assert g[2] > 256 and g[3] > 256  # scaled downstream


def test_stream_trim_preserves_results(monkeypatch, tmp_path):
    monkeypatch.setenv("JDA_TPU_BUDGET_TRIM", "1")
    import jax

    m = jda_tpu.synthetic_model(
        T=2, K=8, landmark_n=5, seed=11, reject_rate=0.3
    )
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 256, (120, 160), np.uint8) for _ in range(8)]

    ref = Detector(m)
    expect = [ref.detect(im, th=-2.0) for im in imgs]

    det = Detector(m)
    out1 = det.detect_stream(imgs, batch=4, th=-2.0)
    plan = next(iter(det._fused_cache.values()))
    assert plan["n"] * 4 > 4096  # the trim-eligible regime
    assert plan.get("trimmed") is True
    out2 = det.detect_stream(imgs, batch=4, th=-2.0)  # runs trimmed

    for e, a, b in zip(expect, out1, out2):
        assert e.n == a.n == b.n
        assert np.array_equal(e.bboxes, a.bboxes)
        assert np.array_equal(e.bboxes, b.bboxes)
        np.testing.assert_allclose(e.scores, a.scores, rtol=0, atol=0)
        np.testing.assert_allclose(e.scores, b.scores, rtol=0, atol=0)


def test_budget_store_roundtrip(monkeypatch, tmp_path):
    import jax

    monkeypatch.setenv("JDA_TPU_BUDGET_TRIM", "1")
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        m = jda_tpu.synthetic_model(
            T=2, K=8, landmark_n=5, seed=11, reject_rate=0.3
        )
        det = Detector(m)
        key = ("c", 4, 120, 160, 1.25, 24, 120, False)
        assert det._budget_load(key, 3) is None
        plan = {
            "budgets": (512, 256, 256),
            "bkey": det._budget_key(key),
        }
        det._budget_save(plan)
        assert det._budget_load(key, 3) == (512, 256, 256)
        # wrong arity -> ignored
        assert det._budget_load(key, 4) is None
        # a fresh detector of the same model sees the stored budgets
        det2 = Detector(m)
        assert det2._budget_load(key, 3) == (512, 256, 256)
        # a different model does not
        m2 = jda_tpu.synthetic_model(
            T=2, K=8, landmark_n=5, seed=12, reject_rate=0.3
        )
        assert Detector(m2)._budget_load(key, 3) is None
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
