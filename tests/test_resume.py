"""Checkpoint/resume: interrupt training after stage 1, resume from the
model + corpus snapshots, and finish — the `jda resume` workload
(src/train.cpp:54-79, cursor semantics cascador.hpp:125-139)."""

import sys

import numpy as np

sys.path.insert(0, "tests")
from test_training import _tiny_config, build_synthetic  # noqa: E402

from jda_tpu.data import DataSet  # noqa: E402
from jda_tpu.params import save_model, load_model  # noqa: E402
from jda_tpu.train.boost import Trainer  # noqa: E402


def test_resume_after_stage(tmp_path):
    c = _tiny_config()
    tr = Trainer(c)
    tr.mining_max_batches = 30
    rows, gts, bgs = build_synthetic(c, n_pos=150)
    tr.set_synthetic_data(rows, gts, bgs)

    # train stage 1 only, then snapshot like the per-stage checkpoint
    tr.model.stage_idx = 0
    tr.pos.calc_st_parameters(tr.model.mean_shape)
    tr.neg.calc_st_parameters(tr.model.mean_shape)
    tr.train_stage(0)
    tr.model.stage_idx, tr.model.cart_idx = 1, -1
    mpath = str(tmp_path / "snap.model")
    dpath = str(tmp_path / "snap.data")
    save_model(tr.model, mpath)
    DataSet.snapshot(tr.pos, tr.neg, dpath)
    stage0_W = tr.model.W[0].copy()
    stage0_th = tr.model.cart_th[0].copy()

    # fresh process: resume from the snapshots and finish
    model = load_model(mpath)
    assert (model.stage_idx, model.cart_idx) == (1, -1)
    tr2 = Trainer(c, model=model)
    tr2.mining_max_batches = 30
    DataSet.resume(dpath, tr2.pos, tr2.neg)
    tr2.neg_gen.load_images(bgs, tr2.rng)
    tr2.train()

    # stage 1 untouched, stage 2 trained, cursor completed
    np.testing.assert_allclose(tr2.model.W[0], stage0_W)
    np.testing.assert_allclose(tr2.model.cart_th[0], stage0_th)
    # stage 2 trained from the snapshot; the tiny fixture's mining can
    # legitimately dry up mid-stage, in which case the trailing carts are
    # exact pass-throughs (th = -inf) — require a trained prefix with no
    # gaps, not a fully-thresholded stage
    th1 = tr2.model.cart_th[1]
    finite = th1 > -1e29
    assert finite[0]
    n_trained = int(finite.sum())
    assert finite[:n_trained].all() and not finite[n_trained:].any()
    assert np.abs(tr2.model.W[1]).sum() > 0
    assert tr2.model.stage_idx == c.T
    assert tr2.pos.size > 0
