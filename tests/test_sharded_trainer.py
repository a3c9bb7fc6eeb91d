"""Mesh-sharded Trainer vs single-device Trainer.

The sharded path (train/sharded.py) must make IDENTICAL training
decisions: every reduction feeding a split decision is an exact
fixed-point sum (weights quantized to 2^-23 in DataSet.update_weights,
residuals to 2^-10 in train/split.py), the regression objective uses
order-independent sufficient statistics, and decision metrics are
mantissa-quantized before argmin — so the single-chip and mesh trainers
produce bit-equal models (the reference's own OpenMP training is
run-to-run nondeterministic, common.cpp:233-238; this is deliberately
stronger).
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from jda_tpu.train.boost import Trainer

from test_training import _tiny_config, build_synthetic


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("dp",))


def _train_pair(fused_ref=True, **cfg_kw):
    c1 = _tiny_config(**cfg_kw)
    t_ref = Trainer(c1)
    t_ref.use_fused_cart = fused_ref
    t_ref.mining_max_batches = 40
    rows, gts, bgs = build_synthetic(c1)
    t_ref.set_synthetic_data(rows, gts, bgs)
    t_ref.train()

    c2 = _tiny_config(**cfg_kw)
    t_sh = Trainer(c2, mesh=_mesh())
    t_sh.mining_max_batches = 40
    rows2, gts2, bgs2 = build_synthetic(c2)
    t_sh.set_synthetic_data(rows2, gts2, bgs2)
    t_sh.train()
    return t_ref, t_sh


def test_sharded_trainer_matches_single_device():
    """EXACT decision equality: quantized weights/residuals make every
    reduction order-independent (see module docstring), so the two paths'
    integer decisions — chosen features, thresholds, landmarks — and the
    host-computed float fields (leaf scores, cart thresholds from
    identical f64 score streams) must agree bit-for-bit."""
    t_ref, t_sh = _train_pair()
    a, b = t_ref.model, t_sh.model

    # integer decisions: 100% equality
    np.testing.assert_array_equal(a.lmk1, b.lmk1)
    np.testing.assert_array_equal(a.lmk2, b.lmk2)
    np.testing.assert_array_equal(a.scale, b.scale)
    np.testing.assert_array_equal(a.feat_th, b.feat_th)
    np.testing.assert_array_equal(a.off1, b.off1)
    np.testing.assert_array_equal(a.off2, b.off2)

    # host-f64 fields from identical decision streams: exact
    np.testing.assert_array_equal(a.leaf_scores, b.leaf_scores)
    np.testing.assert_array_equal(a.cart_th, b.cart_th)
    np.testing.assert_array_equal(a.mean, b.mean)
    np.testing.assert_array_equal(a.std, b.std)

    # identical corpus dynamics
    assert t_ref.pos.size == t_sh.pos.size
    np.testing.assert_array_equal(t_ref.pos.live_idx(), t_sh.pos.live_idx())

    # ridge W from exact (A, b): bit-equal
    np.testing.assert_array_equal(a.W, b.W)


@pytest.mark.parametrize("kw", [dict(with_similarity_transform=True)],
                         ids=["similarity-transform"])
def test_sharded_trainer_variant(kw):
    """With similarity transforms the feature coordinate is
    round((pt + stp @ off) * S): the 2x2 rotation can land 1 ulp from a
    .5 boundary, and any two differently-compiled XLA programs (sharded
    vs single-device) may round such a coordinate apart — one flipped
    node then cascades through later carts (different partitions ->
    different scores -> different removals).  Bitwise equality across
    programs is therefore not a meaningful ST contract (the reference's
    own OpenMP training is run-to-run nondeterministic,
    common.cpp:233-238); the sharded ST trainer must instead produce an
    equally GOOD model: same alignment-error regime, same corpus
    dynamics."""
    t_ref, t_sh = _train_pair(**kw)
    from jda_tpu.utils import calc_mean_error

    errs = []
    for tr in (t_ref, t_sh):
        live = tr.pos.live_idx()
        errs.append(
            calc_mean_error(
                tr.pos.gt_shapes[live],
                tr.pos.current_shapes[live],
                tr.c.left_pupils,
                tr.c.right_pupils,
            )
        )
    assert errs[1] < 1.3 * errs[0] + 0.01, errs
    # same corpus dynamics: comparable survivor counts
    assert abs(t_ref.pos.size - t_sh.pos.size) <= 0.1 * t_ref.pos.size
    # the early decisions (before the first rounding cliff) agree broadly
    a, b = t_ref.model, t_sh.model
    assert (a.feat_th[0, :4] == b.feat_th[0, :4]).mean() >= 0.5
