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
