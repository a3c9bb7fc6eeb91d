"""The cursor/W seam: a "stage complete" cursor must imply a populated W.

Round 2 shipped a flagship model whose stage-1 regression matrix was all
zero: a per-cart checkpoint at cart K-1 was re-encoded as stage-complete
(the reference's (stage, K-1) -> (stage+1, -1) rollover, cursor semantics
/root/reference/include/jda/cascador.hpp:125-139 and
src/jda/cascador.cpp:93-104) before the stage's global regression ran.
These tests reproduce that failure mode and assert it now fails loudly at
both the save and load seams.
"""

import numpy as np
import pytest

from jda_tpu.params import load_model, save_model, synthetic_model


def _trained_stage0_model():
    m = synthetic_model(T=2, K=4, landmark_n=5, tree_depth=4, seed=3)
    # stage 0 carts are trained (nonzero leaf scores) but the stage's
    # global regression never ran
    m.W[0] = 0.0
    assert np.any(m.leaf_scores[0])
    return m


def test_save_refuses_rollover_without_regression(tmp_path):
    m = _trained_stage0_model()
    m.stage_idx, m.cart_idx = 0, m.K - 1  # the exact round-2 state
    with pytest.raises(ValueError, match="W\\[0\\] *is all zero|W\\[0\\]"):
        save_model(m, str(tmp_path / "bad.model"))


def test_save_refuses_already_rolled_cursor(tmp_path):
    m = _trained_stage0_model()
    m.stage_idx, m.cart_idx = 1, -1
    with pytest.raises(ValueError):
        save_model(m, str(tmp_path / "bad.model"))


def test_allow_incomplete_writes_resumable_cursor(tmp_path):
    m = _trained_stage0_model()
    m.stage_idx, m.cart_idx = 0, m.K - 1
    p = str(tmp_path / "partial.model")
    save_model(m, p, allow_incomplete_stage=True)
    back = load_model(p)  # loads cleanly: no stage is marked complete
    # resume retrains cart K-1 and then runs the stage regression
    assert (back.stage_idx, back.cart_idx) == (0, m.K - 2)


def test_load_rejects_broken_artifact(tmp_path):
    m = _trained_stage0_model()
    m.stage_idx, m.cart_idx = 1, -1
    p = str(tmp_path / "broken.model")
    # produce the corrupt artifact the way round 2 effectively did
    save_model(m, p, allow_incomplete_stage=True)
    with pytest.raises(ValueError):
        load_model(p)
    inspect = load_model(p, check=False)  # forensic loading still possible
    assert not np.any(inspect.W[0])


def test_passthrough_stages_are_legitimate(tmp_path):
    """Mining-exhausted stages (leaf scores all zero, W all zero) are a
    valid 'complete' state and must not be flagged."""
    m = synthetic_model(T=3, K=4, landmark_n=5, tree_depth=4, seed=4)
    m.leaf_scores[2] = 0.0
    m.W[2] = 0.0
    m.stage_idx, m.cart_idx = 3, -1
    p = str(tmp_path / "pass.model")
    save_model(m, p)
    back = load_model(p)
    assert back.stage_idx == 3


def test_healthy_rollover_still_rolls(tmp_path):
    m = synthetic_model(T=2, K=4, landmark_n=5, tree_depth=4, seed=5)
    assert np.any(m.W[0])
    m.stage_idx, m.cart_idx = 0, m.K - 1
    p = str(tmp_path / "ok.model")
    save_model(m, p)
    back = load_model(p)
    assert (back.stage_idx, back.cart_idx) == (1, -1)
