"""Sample-sharded training ops: the multi-chip Trainer compute path.

The reference parallelizes all of training with OpenMP over shared memory
(/root/reference/src/jda/data.cpp:1046 and the loops throughout btcart.cpp /
cart.cpp).  The TPU equivalent (SURVEY.md §2, patterns P1/P2/P5) shards the
*sample axis* over a `jax.sharding.Mesh`:

  * the corpus flat pixel buffer is replicated (a 10^5-sample corpus at the
    shipped 48/36/24 geometry is ~0.4 GB uint8 — it fits every chip, and
    replication keeps every feature gather chip-local: zero communication
    in the innermost loop);
  * per-sample state (shapes, weights, geometry rows, masks) is sharded
    over "dp";
  * classification split search: each chip histograms its samples, ONE
    psum of the [F, 511] weight/count histograms crosses ICI, and the
    (feature, threshold) decision is replicated (split.py's
    `classification_split_from_hists` seam);
  * regression split search: the sorted-percentile threshold is recovered
    exactly from a psum'd count histogram (values are ints, so the k-th
    order statistic is the histogram CDF crossing — identical to sorting);
    moment sums for the variance objective are psum'd;
  * tree descent (score updates, LBF, mining validation) is elementwise
    per sample: shard_map with zero collectives, bit-identical to the
    single-chip path;
  * LBF ridge regression: per-chip partial normal equations, one psum of
    (A [F, F], b [F, 2L]), replicated Cholesky solve.

Float reductions (histogram weight sums, variance moments, A/b) change
addition order across topologies, so sharded and single-chip results agree
to float32 reduction tolerance rather than bit-for-bit; the reference's own
OpenMP reductions are run-to-run nondeterministic (omp critical merge
order), so this is strictly more deterministic than the system it replaces.
Integer decisions (chosen features, thresholds, leaf indices, removals)
are expected to match exactly except at genuine float ties.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from jda_tpu.ops import cascade as C
from jda_tpu.train import features as FT
from jda_tpu.train import split as SP

NBINS = SP.NBINS


class ShardedOps:
    """Mesh-bound training ops used by Trainer when a mesh is supplied."""

    def __init__(self, mesh: Mesh, axis: str = "dp"):
        self.mesh = mesh
        self.axis = axis
        self.nd = int(mesh.devices.size)
        self.dp = NamedSharding(mesh, P(axis))
        self.repl = NamedSharding(mesh, P())
        self._cls_cache: Dict[tuple, object] = {}
        self._reg_cache: Dict[bool, object] = {}
        self._descend_cache: Dict[tuple, object] = {}
        self._ridge_fn = None

    # -- placement helpers ---------------------------------------------------

    def shard(self, x):
        return jax.device_put(x, self.dp)

    def replicate(self, x):
        return jax.device_put(x, self.repl)

    # -- classification split -------------------------------------------------

    def _build_cls(self, use_stp: bool):
        axis = self.axis

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(
                P(),  # flat (replicated corpus buffer, positives)
                P(axis),  # geom pos (dict of [M,3])
                P(axis),  # shapes pos
                P(axis),  # w pos
                P(axis),  # valid pos
                P(),  # flat neg
                P(axis),
                P(axis),
                P(axis),
                P(axis),
                P(),  # pool
                P(axis),  # stp pos [Mp, 2, 2] (dummy zeros when ST is off)
                P(axis),  # stp neg
            ),
            out_specs=(P(), P(), P(), P(axis), P(axis)),
            check_vma=False,
        )
        def step(
            flat_p, geom_p, shapes_p, w_p, valid_p,
            flat_n, geom_n, shapes_n, w_n, valid_n,
            pool, stp_p, stp_n,
        ):
            vp = FT.feature_values(
                flat_p, geom_p, shapes_p, pool, stp_p if use_stp else None
            )
            vn = FT.feature_values(
                flat_n, geom_n, shapes_n, pool, stp_n if use_stp else None
            )
            wp, cp = SP._hists(vp, w_p, valid_p)
            wn, cn = SP._hists(vn, w_n, valid_n)
            wp, cp, wn, cn = jax.lax.psum((wp, cp, wn, cn), axis)
            pos_n = jax.lax.psum(jnp.sum(valid_p.astype(jnp.float32)), axis)
            neg_n = jax.lax.psum(jnp.sum(valid_n.astype(jnp.float32)), axis)
            f_idx, th, e = SP.classification_split_from_hists(
                wp, cp, wn, cn, pos_n, neg_n
            )
            # chosen feature's value column (the node partition key)
            vp_col = jnp.take_along_axis(
                vp, jnp.full((vp.shape[0], 1), f_idx, jnp.int32), axis=1
            )[:, 0]
            vn_col = jnp.take_along_axis(
                vn, jnp.full((vn.shape[0], 1), f_idx, jnp.int32), axis=1
            )[:, 0]
            return f_idx, th, e, vp_col, vn_col

        return jax.jit(step)

    def classification_split(
        self, flat_p, geom_p, shapes_p, w_p, valid_p,
        flat_n, geom_n, shapes_n, w_n, valid_n, pool,
        stp_p=None, stp_n=None,
    ):
        use_stp = stp_p is not None
        fn = self._cls_cache.get(use_stp)
        if fn is None:
            fn = self._build_cls(use_stp)
            self._cls_cache[use_stp] = fn
        if not use_stp:
            stp_p = jnp.zeros((shapes_p.shape[0], 2, 2), jnp.float32)
            stp_n = jnp.zeros((shapes_n.shape[0], 2, 2), jnp.float32)
        return fn(
            flat_p, geom_p, shapes_p, w_p, valid_p,
            flat_n, geom_n, shapes_n, w_n, valid_n,
            pool, stp_p, stp_n,
        )

    # -- regression split ------------------------------------------------------

    def _build_reg(self, use_stp: bool):
        axis = self.axis

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(
                P(),  # flat pos
                P(axis),  # geom pos
                P(axis),  # shapes pos
                P(axis),  # residual [Mp, 2]
                P(axis),  # has_gt
                P(axis),  # valid pos
                P(),  # flat neg
                P(axis),  # geom neg
                P(axis),  # shapes neg
                P(),  # pool
                P(),  # u [F]
                P(axis),  # stp pos (dummy zeros when ST is off)
                P(axis),  # stp neg
            ),
            out_specs=(P(), P(), P(), P(axis), P(axis)),
            check_vma=False,
        )
        def step(
            flat, geom, shapes, resid, has_gt, valid,
            flat_n, geom_n, shapes_n, pool, u, stp, stp_n,
        ):
            vals = FT.feature_values(
                flat, geom, shapes, pool, stp if use_stp else None
            )
            M, F = vals.shape
            pos_n = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), axis)

            # exact k-th order statistic via the psum'd count histogram:
            # values are ints in [-255, 255], so sorting == binning
            bins = jnp.clip(vals + 255, 0, NBINS - 1)
            ids = bins + jnp.arange(F, dtype=jnp.int32)[None, :] * NBINS
            cnt = jax.ops.segment_sum(
                jnp.broadcast_to(
                    valid.astype(jnp.int32)[:, None], (M, F)
                ).reshape(-1),
                ids.reshape(-1),
                num_segments=F * NBINS,
            ).reshape(F, NBINS)
            cnt = jax.lax.psum(cnt, axis)
            idx = (pos_n.astype(jnp.float32) * u).astype(jnp.int32)  # trunc
            cum = jnp.cumsum(cnt, axis=1)  # [F, 511]
            # smallest bin with cum >= idx+1  ==  sorted_vals[idx]
            th = (
                jnp.argmax(cum >= (idx + 1)[:, None], axis=1).astype(jnp.int32)
                - 255
            )

            # sufficient-statistics objective (split.py
            # regression_metric_from_sums): per-side residual sums are
            # exact fixed-point sums, so the psum'd values — and therefore
            # the argmin — are bit-identical to the single-chip trainer
            resid_q = SP.quantize_residual(resid)
            gtv = (has_gt & valid).astype(jnp.float32)
            left = (vals <= th[None, :]).astype(jnp.float32) * gtv[:, None]

            n_tot = jax.lax.psum(jnp.sum(gtv), axis)
            nl = jax.lax.psum(jnp.sum(left, axis=0), axis)  # [F]
            nr = n_tot - nl
            sums = []
            for d in range(2):
                S_l = jax.lax.psum(
                    jnp.sum(left * resid_q[:, d : d + 1], axis=0), axis
                )
                S_tot = jax.lax.psum(jnp.sum(gtv * resid_q[:, d]), axis)
                sums.append((S_l, S_tot))
            metric = SP.regression_metric_from_sums(
                sums[0], sums[1], nl=nl, nr=nr
            )
            f_idx = jnp.argmin(metric).astype(jnp.int32)
            out_f = jnp.where(pos_n > 0, f_idx, 0)
            out_th = jnp.where(pos_n > 0, th[f_idx], jnp.int32(-256))
            vals_n = FT.feature_values(
                flat_n, geom_n, shapes_n, pool, stp_n if use_stp else None
            )
            vp_col = jnp.take_along_axis(
                vals, jnp.full((vals.shape[0], 1), out_f, jnp.int32), axis=1
            )[:, 0]
            vn_col = jnp.take_along_axis(
                vals_n,
                jnp.full((vals_n.shape[0], 1), out_f, jnp.int32),
                axis=1,
            )[:, 0]
            return out_f, out_th, metric[f_idx], vp_col, vn_col

        return jax.jit(step)

    def regression_split(
        self, flat, geom, shapes, resid, has_gt, valid,
        flat_n, geom_n, shapes_n, pool, u, stp=None, stp_n=None,
    ):
        use_stp = stp is not None
        fn = self._reg_cache.get(use_stp)
        if fn is None:
            fn = self._build_reg(use_stp)
            self._reg_cache[use_stp] = fn
        if not use_stp:
            stp = jnp.zeros((shapes.shape[0], 2, 2), jnp.float32)
            stp_n = jnp.zeros((shapes_n.shape[0], 2, 2), jnp.float32)
        return fn(
            flat, geom, shapes, resid, has_gt, valid,
            flat_n, geom_n, shapes_n, pool, u, stp, stp_n,
        )

    # -- tree descent (update_scores / gen_lbf) --------------------------------

    def descend(
        self, chunk, flat, geom, shapes, stp, *, depth, rounding, single_scale
    ):
        """carts_descend sharded over samples (zero collectives)."""
        key = (depth, rounding, single_scale, stp is not None)
        fn = self._descend_cache.get(key)
        if fn is None:
            axis = self.axis

            @functools.partial(
                shard_map,
                mesh=self.mesh,
                in_specs=(P(), P(), P(axis), P(axis), P(axis)),
                out_specs=(P(axis), P(axis)),
                check_vma=False,
            )
            def step(chunk_, flat_, geom_, shapes_, stp_):
                state = {
                    "shape": shapes_,
                    "base": geom_["base"],
                    "stride": geom_["stride"],
                    "pw": geom_["pw"],
                    "ph": geom_["ph"],
                }
                return C.carts_descend(
                    chunk_,
                    flat_,
                    state,
                    depth=depth,
                    rounding=rounding,
                    single_scale=single_scale,
                    stp=stp_ if key[3] else None,
                )

            fn = jax.jit(step)
            self._descend_cache[key] = fn
        z = jnp.zeros((shapes.shape[0], 2, 2), jnp.float32)
        return fn(chunk, flat, geom, shapes, stp if stp is not None else z)

    # -- LBF ridge normal equations ---------------------------------------------

    def ridge_accumulate(self, leaves, resid, valid, *, F: int):
        """psum'd (A, b) from sample-sharded LBF rows."""
        if self._ridge_fn is None:
            axis = self.axis

            @functools.partial(
                jax.jit,
                static_argnames=("F_",),
            )
            def outer(leaves_, resid_, valid_, F_):
                @functools.partial(
                    shard_map,
                    mesh=self.mesh,
                    in_specs=(P(axis), P(axis), P(axis)),
                    out_specs=(P(), P()),
                    check_vma=False,
                )
                def step(lv, rs, vd):
                    M = lv.shape[0]
                    E = jnp.zeros((M, F_), jnp.float32)
                    E = E.at[jnp.arange(M)[:, None], lv].set(1.0)
                    E = E * vd[:, None]
                    A = jnp.dot(E.T, E, preferred_element_type=jnp.float32)
                    b = jnp.dot(E.T, rs, preferred_element_type=jnp.float32)
                    return jax.lax.psum((A, b), axis)

                return step(leaves_, resid_, valid_)

            self._ridge_fn = outer
        return self._ridge_fn(leaves, resid, valid, F_=F)


def ridge_lbf_sharded(
    ops: ShardedOps,
    leaves: np.ndarray,  # [N, K] global leaf ids
    residual: np.ndarray,  # [N, 2L]
    F: int,
    lam: Optional[float] = None,
) -> np.ndarray:
    """Mesh-sharded equivalent of regression.ridge_lbf."""
    from jda_tpu.train.regression import _solve

    n = len(leaves)
    if lam is None:
        lam = n / 2.0
    # same fixed-point residual grid as regression.ridge_lbf: psum'd (A, b)
    # match the single-chip accumulation bit-for-bit
    q = np.float32(1 << SP.RESID_FRAC_BITS)
    residual = np.round(residual.astype(np.float32) * q) / q
    pad = (-n) % ops.nd if n else ops.nd
    lv = np.concatenate([leaves, np.zeros((pad, leaves.shape[1]), leaves.dtype)])
    rs = np.concatenate(
        [residual, np.zeros((pad, residual.shape[1]), residual.dtype)]
    )
    vd = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    A, b = ops.ridge_accumulate(
        ops.shard(jnp.asarray(lv, jnp.int32)),
        ops.shard(jnp.asarray(rs, jnp.float32)),
        ops.shard(jnp.asarray(vd)),
        F=F,
    )
    W = _solve(A, b, jnp.float32(lam))
    return np.asarray(W, np.float64)
