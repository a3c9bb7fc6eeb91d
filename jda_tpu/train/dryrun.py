"""Multi-chip training-step dry run.

One boosting split-search step sharded over a device mesh with the layout
the real multi-chip trainer uses (SURVEY.md §2, patterns P1/P2/P5):

  * corpus patches, shapes, and boosting weights are sharded over the
    sample axis ("dp") — each chip holds a contiguous slab of the corpus
    flat buffer and gathers feature pixels purely locally;
  * the F x 511 split histograms are reduced with `psum` over "dp" (the
    only cross-chip traffic — 2 * F * 511 floats per node split);
  * the split decision, leaf-score reduction, and score update are
    replicated (tiny).

Run under `shard_map` so the collective is explicit and ICI-only.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from jda_tpu.train import features as FT
from jda_tpu.train import split as SP


def sharded_train_step_dryrun(mesh: Mesh) -> None:
    devs = mesh.devices.reshape(-1)
    nd = devs.size
    mesh1 = Mesh(devs, ("dp",))

    # tiny synthetic corpus: per-device slabs of pos and neg samples
    dims = (12, 9, 6)
    D = sum(d * d for d in dims)
    L = 5
    F = 32
    mp_loc, mn_loc = 8, 16  # per-device pos / neg samples
    Mp, Mn = mp_loc * nd, mn_loc * nd

    rng = np.random.default_rng(0)
    flat_pos = rng.integers(0, 256, Mp * D).astype(np.int32)
    flat_neg = rng.integers(0, 256, Mn * D).astype(np.int32)
    shapes_pos = rng.uniform(0.2, 0.8, (Mp, 2 * L)).astype(np.float32)
    shapes_neg = rng.uniform(0.2, 0.8, (Mn, 2 * L)).astype(np.float32)
    w_pos = rng.uniform(0.1, 1.0, Mp).astype(np.float32)
    w_neg = rng.uniform(0.1, 1.0, Mn).astype(np.float32)
    pool = FT.gen_feature_pool(rng, F, L, 0.3, multi_scale=True).device()

    # per-device-local geometry (bases address the local slab)
    geom_loc = FT.corpus_geometry(mp_loc, dims)
    geom_loc = {k: jnp.asarray(np.tile(v, (nd, 1))) for k, v in geom_loc.items()}
    geom_loc_n = FT.corpus_geometry(mn_loc, dims)
    geom_loc_n = {
        k: jnp.asarray(np.tile(v, (nd, 1))) for k, v in geom_loc_n.items()
    }

    dp = NamedSharding(mesh1, P("dp"))
    repl = NamedSharding(mesh1, P())

    args = dict(
        flat_pos=jax.device_put(jnp.asarray(flat_pos), dp),
        flat_neg=jax.device_put(jnp.asarray(flat_neg), dp),
        geom_pos=jax.device_put(geom_loc, dp),
        geom_neg=jax.device_put(geom_loc_n, dp),
        shapes_pos=jax.device_put(jnp.asarray(shapes_pos), dp),
        shapes_neg=jax.device_put(jnp.asarray(shapes_neg), dp),
        w_pos=jax.device_put(jnp.asarray(w_pos), dp),
        w_neg=jax.device_put(jnp.asarray(w_neg), dp),
        pool=jax.device_put(pool, repl),
    )

    @functools.partial(
        shard_map,
        mesh=mesh1,
        in_specs=(
            P("dp"),
            P("dp"),
            P("dp"),
            P("dp"),
            P("dp"),
            P("dp"),
            P("dp"),
            P("dp"),
            P(),
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def step(
        flat_pos, flat_neg, geom_pos, geom_neg, shapes_pos, shapes_neg,
        w_pos, w_neg, pool,
    ):
        valid_p = jnp.ones(shapes_pos.shape[0], bool)
        valid_n = jnp.ones(shapes_neg.shape[0], bool)
        vals_p = FT.feature_values(flat_pos, geom_pos, shapes_pos, pool)
        vals_n = FT.feature_values(flat_neg, geom_neg, shapes_neg, pool)
        wp, cp = SP._hists(vals_p, w_pos, valid_p)
        wn, cn = SP._hists(vals_n, w_neg, valid_n)
        # the one cross-chip reduction: histogram psum over the sample axis
        wp, cp, wn, cn = jax.lax.psum((wp, cp, wn, cn), "dp")
        pos_n = jax.lax.psum(jnp.sum(valid_p.astype(jnp.float32)), "dp")
        neg_n = jax.lax.psum(jnp.sum(valid_n.astype(jnp.float32)), "dp")
        return SP.classification_split_from_hists(wp, cp, wn, cn, pos_n, neg_n)

    f_idx, th, ent = jax.jit(step)(
        args["flat_pos"],
        args["flat_neg"],
        args["geom_pos"],
        args["geom_neg"],
        args["shapes_pos"],
        args["shapes_neg"],
        args["w_pos"],
        args["w_neg"],
        args["pool"],
    )
    jax.block_until_ready(ent)
    assert 0 <= int(f_idx) < F
    assert -256 <= int(th) <= 255

    # cross-check vs the single-program path
    geom_glob_p = {k: jnp.asarray(v) for k, v in FT.corpus_geometry(Mp, dims).items()}
    geom_glob_n = {k: jnp.asarray(v) for k, v in FT.corpus_geometry(Mn, dims).items()}
    vals_p = FT.feature_values(
        jnp.asarray(flat_pos), geom_glob_p, jnp.asarray(shapes_pos), pool
    )
    vals_n = FT.feature_values(
        jnp.asarray(flat_neg), geom_glob_n, jnp.asarray(shapes_neg), pool
    )
    f2, th2, e2 = SP.classification_split(
        vals_p,
        jnp.asarray(w_pos),
        jnp.ones(Mp, bool),
        vals_n,
        jnp.asarray(w_neg),
        jnp.ones(Mn, bool),
    )
    assert int(f_idx) == int(f2) and int(th) == int(th2), (
        f"sharded split ({int(f_idx)}, {int(th)}) != "
        f"single-chip ({int(f2)}, {int(th2)})"
    )


def sharded_trainer_dryrun(mesh: Mesh) -> None:
    """Train one REAL Trainer cart on the mesh (not a synthetic step):
    exercises the mesh-bound classification/regression split search, the
    sample-sharded descent (score update), and the psum'd LBF ridge."""
    from jda_tpu.config import Config
    from jda_tpu.data import patch_row
    from jda_tpu.train.boost import Trainer

    c = Config(
        T=1,
        K=4,
        landmark_n=5,
        tree_depth=4,
        shift_size=0.05,
        multi_scale=False,
        img_o_size=24,
        img_h_size=18,
        img_q_size=12,
        mining_th=(0.5,),
        feats=(24,),
        radius=(0.3,),
        probs=(0.5,),
        recall=(0.99,),
        drops=(1,),
        nps=(1.0,),
        score_normalization_steps=(1,),
        restart_on=False,
        face_augment_on=False,
        left_pupils=(0,),
        right_pupils=(1,),
        snapshot_iter=10_000,
        seed=3,
    )
    rng = np.random.default_rng(0)
    n_pos = 64
    rows, gts = [], []
    for _ in range(n_pos):
        img = rng.integers(40, 220, (c.img_o_size, c.img_o_size)).astype(
            np.uint8
        )
        rows.append(patch_row(img, c))
        gts.append(rng.uniform(0.2, 0.8, 2 * c.landmark_n))
    bgs = [
        rng.integers(0, 256, (80, 80)).astype(np.uint8) for _ in range(3)
    ]
    tr = Trainer(c, mesh=mesh)
    tr.mining_max_batches = 10
    tr.set_synthetic_data(np.stack(rows), np.stack(gts), bgs)
    tr.more_neg_samples(0, 0)
    from jda_tpu.data import DataSet

    DataSet.update_weights(tr.pos, tr.neg)
    tr.train_cart(0, 0)
    tr.update_scores(tr.pos, 0, 0)
    tr.update_scores(tr.neg, 0, 0)
    # -256 is the untrained-node sentinel (boost.py model init); a trained
    # cart must have split at least its root node
    assert (tr.model.feat_th[0, 0] != -256).any()
    assert np.isfinite(tr.model.leaf_scores[0, 0]).all()
    # the psum'd ridge seam
    from jda_tpu.train.sharded import ridge_lbf_sharded

    lbf = tr.gen_lbf(tr.pos, 0)
    resid = tr.pos.shape_residual(tr.pos.live_idx()).astype(np.float32)
    W = ridge_lbf_sharded(tr.ops, lbf, resid, c.lbf_dim)
    assert W.shape == (c.lbf_dim, 2 * c.landmark_n)
    assert np.isfinite(W).all()
