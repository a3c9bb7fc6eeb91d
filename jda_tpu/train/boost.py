"""The joint-cascade trainer: RealBoost + joint classification/regression.

TPU-native re-design of JoinCascador::Train / BoostCart::Train / Cart::Train
(/root/reference/src/jda/cascador.cpp:33-55, btcart.cpp:120-317,
cart.cpp:41-162).  Orchestration (stage/cart loops, DFS node splitting,
restart logic, thresholds, snapshots) runs on host over numpy state; every
hot operation is a device batch:

  * feature matrices: train/features.py (flat-buffer gathers + matmuls)
  * split search:     train/split.py   (histogram/variance reductions)
  * corpus forward:   ops/cascade.py   (the same wide-descent kernel
                      detection uses — corpora ARE window batches)
  * global regression: train/regression.py (ridge normal equations, MXU)
  * hard-negative validation: batched partial cascade

Determinism: a single np.random.Generator drives pool sampling, coin
flips, percentiles, and mining shifts (the reference's tick-seeded
per-thread cv::RNGs are nondeterministic by design; SURVEY.md §2 P7).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from jda_tpu.config import Config
from jda_tpu.data import DataSet, NegGenerator, st_apply
from jda_tpu.params import CascadeParams, save_model
from jda_tpu.ops import cascade as C
from jda_tpu.train import features as FT
from jda_tpu.train import split as SP
from jda_tpu.train import regression as RG
from jda_tpu.utils import log, calc_mean_error, draw_density_graph


def _bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


_featvals_jit = jax.jit(FT.feature_values)
_widen_rows_jit = jax.jit(lambda r: r.astype(jnp.int32).reshape(-1))


@functools.partial(jax.jit, static_argnames=("depth",))
def _cart_fused_jit(
    canvas_p, shapes_p, stp_p, w_p, live_p,
    canvas_n, shapes_n, stp_n, w_n, live_n,
    resid_all, hasgt_all, pools, clsflags, us,
    *, depth: int,
):
    """An ENTIRE cart's split search in one dispatch: the 7-node DFS of
    Cart::Train (cart.cpp:41-162) runs on device over the resident corpus
    mirrors, with node membership tracked as boolean masks instead of
    gathered index subsets — so every node sees the same static [cap, F]
    shapes (one compilation, ever) and no per-node host round-trips.

    Per node: MXU feature extraction over ALL rows (masked rows cost
    compute but keep shapes static — a subtree level is <= 3x the work of
    its live rows), then a lax.cond between the classification and
    regression split searches (the flag is the reference's per-node coin,
    cart.cpp:72-77).  Children masks derive from the winning feature's
    value column.  Returns per-node (feature, threshold) and each
    sample's leaf assignment; leaf SCORES are computed on host in f64
    from the returned assignments (exact log-ratio semantics,
    cart.cpp:164-174)."""
    node_n = (1 << (depth - 1)) - 1
    leaf_base = 1 << (depth - 1)
    F = pools["lmk1"].shape[1]
    masks_p = {1: live_p}
    masks_n = {1: live_n}
    f_list, th_list = [], []
    for node in range(1, node_n + 1):
        pool = {
            k: pools[k][node - 1] for k in ("lmk1", "lmk2", "off1", "off2")
        }
        vp = FT.feature_values_mxu(canvas_p, shapes_p, pool, stp_p)
        vn = FT.feature_values_mxu(canvas_n, shapes_n, pool, stp_n)
        validp = masks_p[node]
        validn = masks_n[node]

        def cls(_):
            wp = jnp.where(validp, w_p, 0.0)
            wn = jnp.where(validn, w_n, 0.0)
            f, th, _ = SP.classification_split(
                vp, wp, validp, vn, wn, validn
            )
            return f.astype(jnp.int32), th.astype(jnp.int32)

        def reg(_):
            hg = hasgt_all & validp
            f, th, _ = SP.regression_split(
                vp, resid_all, hg, validp, us[node - 1]
            )
            return f.astype(jnp.int32), th.astype(jnp.int32)

        f_idx, th = jax.lax.cond(clsflags[node - 1], cls, reg, None)
        both_empty = (
            jnp.sum(validp.astype(jnp.int32))
            + jnp.sum(validn.astype(jnp.int32))
        ) == 0
        f_idx = jnp.where(both_empty, 0, f_idx)
        th = jnp.where(both_empty, jnp.int32(-256), th)
        oh = (jnp.arange(F, dtype=jnp.int32) == f_idx).astype(jnp.float32)
        # values fit in [-255, 255]: the f32 one-hot contraction is exact
        vpc = jnp.einsum("mf,f->m", vp.astype(jnp.float32), oh).astype(
            jnp.int32
        )
        vnc = jnp.einsum("mf,f->m", vn.astype(jnp.float32), oh).astype(
            jnp.int32
        )
        masks_p[2 * node] = validp & (vpc <= th)
        masks_p[2 * node + 1] = validp & (vpc > th)
        masks_n[2 * node] = validn & (vnc <= th)
        masks_n[2 * node + 1] = validn & (vnc > th)
        f_list.append(f_idx)
        th_list.append(th)
    leaf_p = sum(
        li * masks_p[leaf_base + li].astype(jnp.int32)
        for li in range(leaf_base)
    )
    leaf_n = sum(
        li * masks_n[leaf_base + li].astype(jnp.int32)
        for li in range(leaf_base)
    )
    return jnp.stack(f_list), jnp.stack(th_list), leaf_p, leaf_n


@functools.partial(jax.jit, static_argnames=("depth",))
def _descend_canvas_jit(canvas, shapes_all, stp_all, idxp, chunk, *, depth):
    """Wide descent of a cart chunk over corpus rows with MXU feature
    extraction — bit-identical to carts_descend's flat-gather path (same
    round/clip arithmetic, train/features.py feature_values_mxu) but with
    zero pixel gathers.  Returns (leaves [b, C], leaf score b [b, C])."""
    C_, node_n = chunk["feat_th"].shape
    cp = jnp.take(canvas, idxp, axis=0)
    sp = jnp.take(shapes_all, idxp, axis=0)
    stp = jnp.take(stp_all, idxp, axis=0) if stp_all is not None else None
    pool = {
        "lmk1": chunk["lmk1"].reshape(-1),
        "lmk2": chunk["lmk2"].reshape(-1),
        "off1": chunk["off1"].reshape(-1, 2),
        "off2": chunk["off2"].reshape(-1, 2),
    }
    v = FT.feature_values_mxu(cp, sp, pool, stp).reshape(-1, C_, node_n)
    bits = []
    for r in range(depth - 1):
        nodes = range((1 << r) - 1, (1 << (r + 1)) - 1)
        vv = C._bit_select([v[:, :, j] for j in nodes], bits)
        th = C._bit_select(
            [
                jnp.broadcast_to(chunk["feat_th"][:, j][None, :], vv.shape)
                for j in nodes
            ],
            bits,
        )
        bits.append(vv > th)
    leaves = sum(
        b.astype(jnp.int32) << (depth - 2 - i) for i, b in enumerate(bits)
    )
    ls = chunk["leaf_scores"]
    leaf_planes = [
        jnp.broadcast_to(ls[:, j][None, :], leaves.shape)
        for j in range(1 << (depth - 1))
    ]
    b = C._bit_select(leaf_planes, bits)
    return leaves, b
_descend_jit = jax.jit(
    C.carts_descend, static_argnames=("depth", "rounding", "single_scale")
)
_chunk_jit = jax.jit(
    C.run_cart_chunk, static_argnames=("depth", "rounding", "single_scale")
)
_regress_jit = jax.jit(C.apply_regression, static_argnames=("leaf_n", "exact"))


def empty_model(c: Config) -> CascadeParams:
    """All-zero cascade with training cursor at (0, -1)."""
    T, K, L = c.T, c.K, c.landmark_n
    node_n, leaf_n = c.node_n, c.leaf_n
    return CascadeParams(
        T=T,
        K=K,
        landmark_n=L,
        tree_depth=c.tree_depth,
        stage_idx=0,
        cart_idx=-1,
        mean_shape=np.zeros(2 * L),
        scale=np.zeros((T, K, node_n), np.int32),
        lmk1=np.zeros((T, K, node_n), np.int32),
        lmk2=np.zeros((T, K, node_n), np.int32),
        off1=np.zeros((T, K, node_n, 2)),
        off2=np.zeros((T, K, node_n, 2)),
        feat_th=np.full((T, K, node_n), -256, np.int32),
        leaf_scores=np.zeros((T, K, leaf_n)),
        cart_th=np.full((T, K), -1e30),
        mean=np.zeros((T, K)),
        std=np.ones((T, K)),
        W=np.zeros((T, K * leaf_n, 2 * L)),
    )


class Trainer:
    """Joint cascade trainer (the `jda train` / `jda resume` workloads)."""

    def __init__(
        self,
        c: Config,
        model: Optional[CascadeParams] = None,
        mesh=None,
    ):
        self.c = c
        self.model = model if model is not None else empty_model(c)
        self.rng = np.random.default_rng(c.seed)
        self.pos = DataSet(c, is_pos=True)
        self.neg = DataSet(c, is_pos=False)
        self.neg_gen = NegGenerator(c)
        self.single_scale = not c.multi_scale
        self.mining_max_batches = 2000
        self.mining_batch = 2048  # windows per validation dispatch
        # mining-exhaustion economics: a mining event that nets fewer than
        # dry_yield_frac * want negatives counts as "dry" (0.0 = only a
        # fully-empty event does, the strict reference-like behaviour).
        # Deep stages of a near-converged detector can trickle a handful
        # of negatives per multi-minute event forever (FP ~1e-5 means the
        # supply is genuinely spent); two consecutive dry events trigger
        # the same pass-through stage finalization as full exhaustion
        # instead of grinding the round's wall-clock (data.cpp:913-925's
        # infinite spin is the failure mode this replaces).
        self.dry_yield_frac = 0.0
        self._last_want = 0
        self._miner = None  # lazy DeviceMiner (train/mining.py)
        self._canvas_miner = None  # lazy CanvasHardMiner (train/mining.py)
        # single-dispatch cart training (and canvas descent).  Off -> the
        # reference-structured recursion path, which the mesh trainer
        # shares; useful for exact cross-path comparisons under ST where
        # differently-compiled programs can round a coordinate apart
        self.use_fused_cart = True
        self.verbose = False  # per-cart score-density graphs (btcart.cpp:19-102)
        self.snapshot_dir: Optional[str] = None
        self.stats: Dict = {"stages": []}
        # multi-chip: sample-sharded compute over a jax mesh (SURVEY.md §2
        # P1/P2/P5; train/sharded.py).  The corpus buffer is replicated so
        # every chip's gathers are local; split histograms psum over ICI.
        self.ops = None
        if mesh is not None:
            from jda_tpu.train.sharded import ShardedOps

            self.ops = ShardedOps(mesh)
            self.pos.device_sharding = self.ops.repl
            self.neg.device_sharding = self.ops.repl

    # -- data plumbing ------------------------------------------------------

    def load_data(self) -> None:
        """train() data path (src/train.cpp:26-36 without the cache)."""
        self.pos.load_positive(self.c.face_txt, self.rng)
        self.neg_gen.load(self.c.bg_txts, self.rng)
        self.model.mean_shape = self.pos.mean_shape.copy()

    def set_synthetic_data(
        self,
        pos_rows: np.ndarray,  # [N, D] uint8 corpus rows
        gt_shapes: np.ndarray,  # [N, 2L]
        neg_images: List[np.ndarray],
        shape_mask: Optional[np.ndarray] = None,
        neg_factory: Optional[Callable[[int], np.ndarray]] = None,
    ) -> None:
        """Inject an in-memory corpus (tests, embedding)."""
        p = self.pos
        p.imgs = pos_rows.astype(np.uint8)
        p.gt_shapes = gt_shapes.astype(np.float64)
        p.shape_mask = (
            shape_mask.astype(np.int32)
            if shape_mask is not None
            else np.ones(len(pos_rows), np.int32)
        )
        n = len(pos_rows)
        p.live = np.ones(n, bool)
        p.scores = np.zeros(n)
        p.last_scores = np.zeros(n)
        p.weights = np.zeros(n)
        p.calc_mean_shape()
        p.current_shapes = p.random_shapes(self.rng)
        from jda_tpu.data import st_identity

        p.stp_mc = st_identity(n)
        p.stp_cm = st_identity(n)
        p.live = np.ones(n, bool)
        p.invalidate()
        if neg_factory is not None:
            self.neg_gen.load_factory(neg_factory, self.rng)
        else:
            self.neg_gen.load_images(neg_images, self.rng)
        self.model.mean_shape = p.mean_shape.copy()

    # -- device helpers -----------------------------------------------------

    def _subset(self, ds: DataSet, idx: np.ndarray):
        """Bucket-padded device views of a sample subset (mesh-sharded over
        the sample axis when the Trainer is mesh-bound)."""
        m = len(idx)
        b = _bucket(max(m, 1))
        if self.ops is not None:
            b += (-b) % self.ops.nd  # shard_map needs even division
        pad = b - m
        # geometry over PHYSICAL rows (idx index the physical corpus; dead
        # rows linger until lazy compaction)
        geom = FT.corpus_geometry(len(ds.imgs), ds.dims)

        def padg(a, fill=0):
            a = a[idx]
            if pad:
                a = np.concatenate(
                    [a, np.full((pad,) + a.shape[1:], fill, a.dtype)]
                )
            out = jnp.asarray(a)
            return self.ops.shard(out) if self.ops is not None else out

        g = {k: padg(v) for k, v in geom.items()}
        shapes = padg(ds.current_shapes.astype(np.float32))
        valid = jnp.asarray(np.arange(b) < m)
        if self.ops is not None:
            valid = self.ops.shard(valid)
        stp = None
        if self.c.with_similarity_transform:
            stp = padg(ds.stp_mc.astype(np.float32))
        return g, shapes, valid, stp, m, b

    def _model_chunk(self, t: int, k0: int, k1: int) -> Dict[str, jnp.ndarray]:
        m = self.model
        return {
            "scale": jnp.asarray(m.scale[t, k0:k1], jnp.int32),
            "lmk1": jnp.asarray(m.lmk1[t, k0:k1], jnp.int32),
            "lmk2": jnp.asarray(m.lmk2[t, k0:k1], jnp.int32),
            "off1": jnp.asarray(m.off1[t, k0:k1], jnp.float32),
            "off2": jnp.asarray(m.off2[t, k0:k1], jnp.float32),
            "feat_th": jnp.asarray(m.feat_th[t, k0:k1], jnp.int32),
            "leaf_scores": jnp.asarray(m.leaf_scores[t, k0:k1], jnp.float32),
            "cart_th": jnp.asarray(m.cart_th[t, k0:k1], jnp.float32),
            "mean": jnp.asarray(m.mean[t, k0:k1], jnp.float32),
            "std": jnp.asarray(m.std[t, k0:k1], jnp.float32),
        }

    def _descend(self, ds: DataSet, idx: np.ndarray, t: int, k0: int, k1: int):
        """leaves/leaf-scores of carts [k0, k1) on a sample subset."""
        if self.ops is None and self.single_scale and self.use_fused_cart:
            # resident-corpus MXU descent: only the index vector crosses
            # the link (same arithmetic as the flat-gather path)
            m = len(idx)
            b = _bucket(max(m, 1))
            idxp = np.zeros(b, np.int32)
            idxp[:m] = idx
            leaves, bscores = _descend_canvas_jit(
                ds.canvas_dev(),
                ds.shapes_dev(),
                ds.stp_dev(),
                jnp.asarray(idxp),
                self._model_chunk(t, k0, k1),
                depth=self.c.tree_depth,
            )
            return np.asarray(leaves)[:m], np.asarray(bscores)[:m]
        g, shapes, valid, stp, m, b = self._subset(ds, idx)
        if self.ops is not None:
            leaves, bscores = self.ops.descend(
                self.ops.replicate(self._model_chunk(t, k0, k1)),
                ds.flat_dev(),
                g,
                shapes,
                stp,
                depth=self.c.tree_depth,
                rounding=True,
                single_scale=self.single_scale,
            )
            return np.asarray(leaves)[:m], np.asarray(bscores)[:m]
        state = {
            "shape": shapes,
            "base": g["base"],
            "stride": g["stride"],
            "pw": g["pw"],
            "ph": g["ph"],
        }
        leaves, bscores = _descend_jit(
            self._model_chunk(t, k0, k1),
            ds.flat_dev(),
            state,
            depth=self.c.tree_depth,
            rounding=True,  # C++ training semantics (data.cpp:48-51)
            single_scale=self.single_scale,
            stp=stp,
        )
        return np.asarray(leaves)[:m], np.asarray(bscores)[:m]

    # -- cart training (Cart::Train + SplitNode DFS, cart.cpp:41-162) --------

    def train_cart(self, t: int, k: int) -> None:
        c = self.c
        landmark_id = k % c.landmark_n
        leaf_base = 1 << (c.tree_depth - 1)
        if self.single_scale and self.ops is None and self.use_fused_cart:
            return self._train_cart_fused(t, k, landmark_id, leaf_base)
        pools, clsflags, us = self._draw_cart_params(t)

        def split(node: int, pidx: np.ndarray, nidx: np.ndarray):
            if node >= leaf_base:
                li = node - leaf_base
                pw = c.esp + self.pos.weights[pidx].sum()
                nw = c.esp + self.neg.weights[nidx].sum()
                self.model.leaf_scores[t, k, li] = 0.5 * (
                    np.log(pw) - np.log(nw)
                )
                return

            pool = pools[node - 1]
            pool_dev = pool.device()
            is_classification = bool(clsflags[node - 1])

            if len(pidx) == 0 and len(nidx) == 0:
                f_idx, th = 0, -256
                vp_col = np.zeros(0, np.int32)
                vn_col = np.zeros(0, np.int32)
            elif self.ops is not None:
                gp, sp_, vp_mask, stp_p, mp, bp = self._subset(self.pos, pidx)
                gn, sn_, vn_mask, stp_n, mn, bn = self._subset(self.neg, nidx)
                pool_r = self.ops.replicate(pool_dev)

                def padw_dev(ds, idx, b):
                    w = ds.weights[idx].astype(np.float32)
                    return self.ops.shard(
                        jnp.asarray(
                            np.concatenate(
                                [w, np.zeros(b - len(idx), np.float32)]
                            )
                        )
                    )

                if is_classification:
                    f_dev, th_dev, _, vpc, vnc = self.ops.classification_split(
                        self.pos.flat_dev(), gp, sp_,
                        padw_dev(self.pos, pidx, bp), vp_mask,
                        self.neg.flat_dev(), gn, sn_,
                        padw_dev(self.neg, nidx, bn), vn_mask,
                        pool_r, stp_p, stp_n,
                    )
                else:
                    resid = self.pos.shape_residual(pidx, landmark_id).astype(
                        np.float32
                    )
                    resid = np.concatenate(
                        [resid, np.zeros((bp - mp, 2), np.float32)]
                    )
                    has_gt = np.concatenate(
                        [
                            self.pos.shape_mask[pidx] == 1,
                            np.zeros(bp - mp, bool),
                        ]
                    )
                    u = us[node - 1]
                    f_dev, th_dev, _, vpc, vnc = self.ops.regression_split(
                        self.pos.flat_dev(), gp, sp_,
                        self.ops.shard(jnp.asarray(resid)),
                        self.ops.shard(jnp.asarray(has_gt)),
                        vp_mask,
                        self.neg.flat_dev(), gn, sn_,
                        pool_r,
                        self.ops.replicate(jnp.asarray(u)),
                        stp_p, stp_n,
                    )
                f_idx, th = int(f_dev), int(th_dev)
                vp_col = np.asarray(vpc)[:mp]
                vn_col = np.asarray(vnc)[:mn]
            else:
                gp, sp_, vp_mask, stp_p, mp, bp = self._subset(self.pos, pidx)
                gn, sn_, vn_mask, stp_n, mn, bn = self._subset(self.neg, nidx)
                vp = _featvals_jit(
                    self.pos.flat_dev(), gp, sp_, pool_dev, stp_p
                )
                vn = _featvals_jit(
                    self.neg.flat_dev(), gn, sn_, pool_dev, stp_n
                )

                def padw(ds, idx, b):
                    w = ds.weights[idx].astype(np.float32)
                    return jnp.asarray(
                        np.concatenate([w, np.zeros(b - len(idx), np.float32)])
                    )

                if is_classification:
                    f_dev, th_dev, _ = SP.classification_split(
                        vp,
                        padw(self.pos, pidx, bp),
                        vp_mask,
                        vn,
                        padw(self.neg, nidx, bn),
                        vn_mask,
                    )
                else:
                    resid = self.pos.shape_residual(pidx, landmark_id).astype(
                        np.float32
                    )
                    resid = np.concatenate(
                        [resid, np.zeros((bp - mp, 2), np.float32)]
                    )
                    has_gt = np.concatenate(
                        [
                            self.pos.shape_mask[pidx] == 1,
                            np.zeros(bp - mp, bool),
                        ]
                    )
                    u = us[node - 1]
                    f_dev, th_dev, _ = SP.regression_split(
                        vp,
                        jnp.asarray(resid),
                        jnp.asarray(has_gt),
                        vp_mask,
                        jnp.asarray(u),
                    )
                f_idx, th = int(f_dev), int(th_dev)
                vp_col = np.asarray(vp[:, f_idx])[:mp]
                vn_col = np.asarray(vn[:, f_idx])[:mn]

            sc, l1, l2, o1, o2 = pool.select(f_idx)
            ni = node - 1  # heap index 1..7 -> storage 0..6
            self.model.scale[t, k, ni] = sc
            self.model.lmk1[t, k, ni] = l1
            self.model.lmk2[t, k, ni] = l2
            self.model.off1[t, k, ni] = o1
            self.model.off2[t, k, ni] = o2
            self.model.feat_th[t, k, ni] = th

            go_left_p = vp_col <= th
            go_left_n = vn_col <= th
            split(2 * node, pidx[go_left_p], nidx[go_left_n])
            split(2 * node + 1, pidx[~go_left_p], nidx[~go_left_n])

        split(1, self.pos.live_idx(), self.neg.live_idx())

    def _draw_cart_params(self, t: int):
        """Per-node random draws for one cart, in heap order (node 1..7):
        feature pool, split-type coin, regression percentile vector.  The
        reference draws these lazily during its DFS (cart.cpp:60-77);
        drawing them up front gives the fused single-dispatch path and the
        mesh path identical random streams — and therefore identical
        models — regardless of node visit order."""
        c = self.c
        node_n = (1 << (c.tree_depth - 1)) - 1
        pools = []
        clsflags = np.zeros(node_n, bool)
        us = np.zeros((node_n, c.feats[t]), np.float32)
        for ni in range(node_n):
            pools.append(
                FT.gen_feature_pool(
                    self.rng, c.feats[t], c.landmark_n, c.radius[t],
                    c.multi_scale,
                )
            )
            clsflags[ni] = self.rng.uniform() < c.probs[t]
            if not clsflags[ni]:
                us[ni] = self.rng.uniform(0.1, 0.9, c.feats[t]).astype(
                    np.float32
                )
        return pools, clsflags, us

    def _train_cart_fused(
        self, t: int, k: int, landmark_id: int, leaf_base: int
    ) -> None:
        """Single-scale cart training through _cart_fused_jit: one device
        dispatch per cart.  Host traffic per cart: weights + live masks +
        residuals up (~200 KB), node params + leaf assignments down."""
        c = self.c
        node_n = leaf_base - 1
        capP = self.pos.canvas_dev().shape[0]
        capN = self.neg.canvas_dev().shape[0]
        npph = len(self.pos.imgs)
        nnph = len(self.neg.imgs)
        wp_all = np.zeros(capP, np.float32)
        wp_all[:npph] = self.pos.weights
        wn_all = np.zeros(capN, np.float32)
        wn_all[:nnph] = self.neg.weights
        live_p = np.zeros(capP, bool)
        live_p[:npph] = self.pos.live
        live_n = np.zeros(capN, bool)
        live_n[:nnph] = self.neg.live
        resid_all = np.zeros((capP, 2), np.float32)
        resid_all[:npph] = self.pos.shape_residual(
            np.arange(npph), landmark_id
        ).astype(np.float32)
        hasgt_all = np.zeros(capP, bool)
        hasgt_all[:npph] = self.pos.shape_mask == 1
        pools, clsflags, us = self._draw_cart_params(t)
        pools_dev = {
            "lmk1": jnp.asarray(np.stack([p.lmk1 for p in pools])),
            "lmk2": jnp.asarray(np.stack([p.lmk2 for p in pools])),
            "off1": jnp.asarray(
                np.stack([p.off1 for p in pools]).astype(np.float32)
            ),
            "off2": jnp.asarray(
                np.stack([p.off2 for p in pools]).astype(np.float32)
            ),
        }
        f7, th7, leafp, leafn = _cart_fused_jit(
            self.pos.canvas_dev(),
            self.pos.shapes_dev(),
            self.pos.stp_dev(),
            jnp.asarray(wp_all),
            jnp.asarray(live_p),
            self.neg.canvas_dev(),
            self.neg.shapes_dev(),
            self.neg.stp_dev(),
            jnp.asarray(wn_all),
            jnp.asarray(live_n),
            jnp.asarray(resid_all),
            jnp.asarray(hasgt_all),
            pools_dev,
            jnp.asarray(clsflags),
            jnp.asarray(us),
            depth=c.tree_depth,
        )
        f7 = np.asarray(f7)
        th7 = np.asarray(th7)
        leafp = np.asarray(leafp)[:npph]
        leafn = np.asarray(leafn)[:nnph]
        m = self.model
        for ni in range(node_n):
            sc, l1, l2, o1, o2 = pools[ni].select(int(f7[ni]))
            m.scale[t, k, ni] = sc
            m.lmk1[t, k, ni] = l1
            m.lmk2[t, k, ni] = l2
            m.off1[t, k, ni] = o1
            m.off2[t, k, ni] = o2
            m.feat_th[t, k, ni] = int(th7[ni])
        # exact f64 leaf scores from the device leaf assignments
        # (cart.cpp:164-174)
        for li in range(leaf_base):
            pw = c.esp + self.pos.weights[
                self.pos.live & (leafp == li)
            ].sum()
            nw = c.esp + self.neg.weights[
                self.neg.live & (leafn == li)
            ].sum()
            m.leaf_scores[t, k, li] = 0.5 * (np.log(pw) - np.log(nw))

    # -- incremental scoring / LBF -----------------------------------------

    def update_scores(self, ds: DataSet, t: int, k: int) -> None:
        """DataSet::UpdateScores (data.cpp:305-317), live rows only."""
        ds.last_scores = ds.scores.copy()
        if ds.size == 0:
            return
        idx = ds.live_idx()
        _, b = self._descend(ds, idx, t, k, k + 1)
        ds.scores[idx] += b[:, 0].astype(np.float64)

    def gen_lbf(self, ds: DataSet, t: int) -> np.ndarray:
        """BoostCart::GenLBF over live rows: [size, K] global leaf ids."""
        leaves, _ = self._descend(ds, ds.live_idx(), t, 0, self.c.K)
        return leaves + np.arange(self.c.K, dtype=np.int32)[None, :] * self.c.leaf_n

    # -- mining validation (JoinCascador::Validate, cascador.cpp:166-211) ----

    def _model_chunk_padded(self, t: int, n_carts: int) -> Dict[str, jnp.ndarray]:
        """Carts [0, n_carts) padded to a bucketed cart count with exact
        no-op carts (leaf scores 0, mean 0, std 1, threshold -inf): the
        score chain computes (s + 0 - 0) / 1 == s bit-exactly and never
        rejects, so the padded chunk is arithmetically identical to the
        unpadded one — but the COMPILED SHAPE stays fixed while the
        training cursor advances (one compile per bucket, not per cart)."""
        kb = min(_bucket(max(n_carts, 1)), self.c.K)
        chunk = self._model_chunk(t, 0, kb)
        if kb > n_carts:
            sl = slice(n_carts, kb)
            chunk = dict(chunk)
            for key in ("leaf_scores", "mean"):
                chunk[key] = chunk[key].at[sl].set(0.0)
            chunk["std"] = chunk["std"].at[sl].set(1.0)
            chunk["cart_th"] = chunk["cart_th"].at[sl].set(-np.inf)
        return chunk

    def make_validator(self, stage: int, cart: int) -> Callable:
        """Partial-cascade batch validator for hard-negative mining.
        `stage` full stages are complete; carts [0..cart] of stage `stage`
        are trained (cart == -1 -> none yet)."""
        c = self.c
        dims = (c.img_o_size, c.img_h_size, c.img_q_size)
        ms = self.model.mean_shape.astype(np.float32)
        ms_dev = jnp.asarray(ms)
        # model chunks hoisted out of the per-batch path (one upload per
        # mining event, not ~10 small transfers per validate() call)
        full_chunks = [self._model_chunk(tt, 0, c.K) for tt in range(stage)]
        w_devs = [
            jnp.asarray(self.model.W[tt], jnp.float32) for tt in range(stage)
        ]
        part_chunk = (
            self._model_chunk_padded(stage, cart + 1) if cart >= 0 else None
        )
        geom_cache: Dict[int, Dict] = {}

        def validate_dev(flat_dev, shapes_dev, valid_dev, b: int):
            """Device-level core: flat corpus buffer, initial shapes and
            validity mask already on device; returns device state arrays.
            The device miner (train/mining.py) calls this directly so
            candidate pixels never cross the host boundary."""
            if b not in geom_cache:
                g = FT.corpus_geometry(b, dims)
                geom_cache[b] = {
                    k: jnp.asarray(v) for k, v in g.items()
                }
            geom = geom_cache[b]
            state = C.init_state(
                b,
                ms_dev,
                geom["base"],
                geom["stride"],
                geom["pw"],
                geom["ph"],
                valid_dev,
            )
            state["shape"] = shapes_dev
            with_stp = c.with_similarity_transform
            for tt in range(stage):
                # per-stage similarity transform from the CURRENT shapes
                # (Validate recomputes it at each stage, cascador.cpp:180,
                # and applies it to offsets and the delta, :184,196)
                stp = (
                    C.st_calc_dev(state["shape"], ms_dev)
                    if with_stp
                    else None
                )
                state, leaves = _chunk_jit(
                    full_chunks[tt],
                    flat_dev,
                    state,
                    depth=c.tree_depth,
                    rounding=True,
                    single_scale=self.single_scale,
                    stp=stp,
                )
                state = _regress_jit(
                    w_devs[tt],
                    leaves,
                    state,
                    leaf_n=c.leaf_n,
                    stp=stp,
                )
            if part_chunk is not None:
                stp = (
                    C.st_calc_dev(state["shape"], ms_dev)
                    if with_stp
                    else None
                )
                state, _ = _chunk_jit(
                    part_chunk,
                    flat_dev,
                    state,
                    depth=c.tree_depth,
                    rounding=True,
                    single_scale=self.single_scale,
                    stp=stp,
                )
            return state

        def validate(rows: np.ndarray, shift: Optional[np.ndarray] = None):
            m = len(rows)
            b = _bucket(m)
            flat = np.zeros((b, rows.shape[1]), np.uint8)
            flat[:m] = rows
            # uint8 on the wire; widen to int32 on device (the relay moves
            # ~3-30 MB/s — int32 rows were 4x the bytes for nothing)
            flat_dev = _widen_rows_jit(jnp.asarray(flat))
            if shift is None:
                shift = self.rng.uniform(-c.shift_size, c.shift_size, (m, 2))
            shapes = np.tile(ms, (b, 1)).astype(np.float32)
            shapes[:m, 0::2] += shift[:, 0:1].astype(np.float32)
            shapes[:m, 1::2] += shift[:, 1:2].astype(np.float32)
            state = validate_dev(
                flat_dev,
                jnp.asarray(shapes),
                jnp.asarray(np.arange(b) < m),
                b,
            )
            return (
                np.asarray(state["alive"])[:m],
                np.asarray(state["score"])[:m].astype(np.float64),
                np.asarray(state["shape"])[:m].astype(np.float64),
                np.asarray(state["nvis"])[:m],
            )

        validate.validate_dev = validate_dev
        validate.ms_dev = ms_dev
        return validate

    def more_neg_samples(self, t: int, k: int) -> int:
        """DataSet::MoreNegSamples (data.cpp:479-532).  Returns the number
        of negatives actually mined (-1 when none were needed)."""
        c = self.c
        want = int(c.nps[t] * self.pos.size) - self.neg.size
        if want <= 0:
            return -1
        self._last_want = want
        log(f"mining {want} hard negatives (stage {t}, cart {k})")
        t0 = time.time()
        validator = self.make_validator(t, k - 1)
        # multi-scale configs are handled too: the device synth emits the
        # h/q patches (mining._make_synth sizes) and validate_dev's corpus
        # geometry reads all three planes
        use_dev = os.environ.get("JDA_TPU_DEVICE_MINER", "1") != "0"
        if use_dev:
            if self._miner is None:
                from jda_tpu.train.mining import DeviceMiner

                self._miner = DeviceMiner(
                    self.neg_gen,
                    c,
                    per_state=max(
                        self.mining_batch // self.neg_gen.n_states, 64
                    ),
                )
            use_dev = self._miner.applicable
        scan_mb = self.mining_max_batches
        last_fp = getattr(self, "_last_scan_fp", None)
        if (
            last_fp is not None
            and getattr(self.neg_gen, "hard_factory", None) is not None
            and last_fp * self.mining_batch * scan_mb < 0.5 * want
        ):
            # The background scan demonstrably cannot fill the quota any
            # more (its FP rate decays exponentially in trained carts,
            # the reference's known exhaustion regime, data.cpp:1026-1065)
            # — take a cheap diversity sample and let the hard factory
            # fill the rest instead of burning minutes on a full scan.
            scan_mb = max(self.mining_max_batches // 25, 8)
        if use_dev:
            rows, scores, shapes, stats = self._miner.generate(
                validator,
                want,
                max_batches=scan_mb,
                rng=self.rng,
            )
        else:
            rows, scores, shapes, stats = self.neg_gen.generate(
                validator,
                want,
                batch=self.mining_batch,
                max_batches=scan_mb,
            )
        self._last_scan_fp = stats["fp_rate"]
        if len(rows):
            self.neg.append_negatives(
                rows, scores, shapes, self.model.mean_shape
            )
        log(
            f"mined {len(rows)} in {time.time()-t0:.1f}s; "
            f"FP={stats['fp_rate']:.6f}, avg reject carts="
            f"{stats['avg_reject_carts']:.2f}"
            + (" [background pool exhausted]" if stats["exhausted"] else "")
        )
        mined = len(rows)
        # Deep-stage top-up: once the background scan under-delivers, draw
        # pre-registered candidates from the hard factory (the reference's
        # hard pool, data.cpp:893-897 — ours is on-demand, so it never runs
        # dry the way round-3's bounded scan did at stage 2+).
        shortfall = want - mined
        use_canvas = (
            shortfall > 0
            and getattr(self.neg_gen, "canvas_factory", None) is not None
            and os.environ.get("JDA_TPU_CANVAS_MINER", "1") != "0"
        )
        if use_canvas:
            # device-batched near-miss mining: one host canvas render
            # amortizes over dozens of screened windows (the per-patch
            # host factory below caps out at ~1k candidates/s on a
            # 1-core host — minutes per event at deep-stage acceptance)
            if self._canvas_miner is None:
                from jda_tpu.train.mining import CanvasHardMiner

                self._canvas_miner = CanvasHardMiner(
                    self.neg_gen,
                    c,
                    per_slot=max(self.mining_batch // 16, 64),
                )
            t1 = time.time()
            hrows, hscores, hshapes, hstats = self._canvas_miner.generate(
                validator,
                shortfall,
                max_batches=max(self.mining_max_batches // 4, 8),
                rng=self.rng,
            )
            if len(hrows):
                self.neg.append_negatives(
                    hrows, hscores, hshapes, self.model.mean_shape
                )
            log(
                f"hard-canvas top-up: {len(hrows)}/{shortfall} in "
                f"{time.time()-t1:.1f}s; FP={hstats['fp_rate']:.6f}, "
                f"difficulty={hstats.get('difficulty', 0.0):.2f}"
            )
            mined += len(hrows)
            shortfall = want - mined
        if shortfall > 0 and getattr(self.neg_gen, "hard_factory", None):
            t1 = time.time()
            hrows, hscores, hshapes, hstats = self.neg_gen.generate_hard(
                validator,
                shortfall,
                batch=self.mining_batch,
                max_batches=(
                    # the canvas miner already swept the near-miss space;
                    # keep the per-patch fallback cheap when it ran
                    max(self.mining_max_batches // 40, 2)
                    if use_canvas
                    else max(self.mining_max_batches // 4, 8)
                ),
            )
            if len(hrows):
                self.neg.append_negatives(
                    hrows, hscores, hshapes, self.model.mean_shape
                )
            log(
                f"hard-factory top-up: {len(hrows)}/{shortfall} in "
                f"{time.time()-t1:.1f}s; FP={hstats['fp_rate']:.6f}, "
                f"difficulty={hstats.get('difficulty', 0.0):.2f}"
            )
            mined += len(hrows)
        return mined

    # -- stage training (BoostCart::Train, btcart.cpp:120-317) ---------------

    def train_stage(self, t: int) -> None:
        c = self.c
        pos, neg = self.pos, self.neg
        pos_original = pos.size
        neg_original = int(pos_original * c.nps[t])
        neg_rejected = 0
        normalization_step = c.landmark_n * c.score_normalization_steps[t]
        drop_n = c.drops[t]
        neg_th = int(pos.size * c.nps[t] * c.mining_th[t])

        start_cart = self.model.cart_idx + 1
        restarts = 0
        best_drop_rate = 0.0
        best_cart_snapshot = None
        dry_minings = 0  # consecutive minings that produced nothing

        k = start_cart
        while k < c.K:
            kk = k + 1
            # max(neg_th, 1): once the pool empties neg_th decays to 0 and
            # `0 < 0` would never re-attempt mining — so the exhaustion
            # early-stop below could never trigger either
            if neg.size < max(neg_th, 1):
                mined = self.more_neg_samples(t, k)
                neg_th = int(neg.size * c.mining_th[t])
                dry = (mined == 0 and neg.size == 0) or (
                    # low-yield exhaustion (see dry_yield_frac above): the
                    # event ran all its bounded miners and netted a trickle
                    self.dry_yield_frac > 0.0
                    and 0 <= mined < self.dry_yield_frac * self._last_want
                )
                dry_minings = dry_minings + 1 if dry else 0
                if dry_minings >= 2:
                    # the background pool has no hard negatives left; the
                    # reference would spin forever (data.cpp:913-925) —
                    # finish the stage with pass-through carts instead
                    log(
                        f"stage {t+1}: hard-negative supply exhausted at "
                        f"cart {kk}/{c.K}; remaining carts are pass-through"
                    )
                    for kr in range(k, c.K):
                        self.model.leaf_scores[t, kr] = 0.0
                        self.model.mean[t, kr] = 0.0
                        self.model.std[t, kr] = 1.0
                        self.model.cart_th[t, kr] = -np.inf
                    self.model.cart_idx = c.K - 1
                    break
            if self.verbose and neg.size:
                print(
                    draw_density_graph(
                        pos.scores[pos.live], neg.scores[neg.live]
                    ),
                    flush=True,
                )
            DataSet.update_weights(pos, neg)

            t0 = time.time()
            self.train_cart(t, k)
            self.model.cart_idx = k
            self.update_scores(pos, t, k)
            self.update_scores(neg, t, k)
            if kk % normalization_step == 0:
                mean, std = DataSet.calc_mean_std(pos, neg)
                self.model.mean[t, k] = mean
                self.model.std[t, k] = std
                pos.apply_mean_std(mean, std)
                neg.apply_mean_std(mean, std)
            else:
                self.model.mean[t, k] = 0.0
                self.model.std[t, k] = 1.0

            th = pos.calc_threshold_by_number(drop_n)
            self.model.cart_th[t, k] = th
            pos_n, neg_n = pos.size, neg.size
            will_remove = neg.pre_remove(th)
            tmp_drop = will_remove / max(neg_n, 1)
            n_carts = t * c.K + k
            if (
                c.restart_on
                and tmp_drop < c.restart_th[t]
                and n_carts > 10
            ):
                restarts += 1
                log(
                    f"cart {kk}: drop rate {tmp_drop*100:.3f}% below "
                    f"restart threshold; restart {restarts}"
                )
                if tmp_drop > best_drop_rate:
                    best_drop_rate = tmp_drop
                    best_cart_snapshot = self._cart_params(t, k)
                if restarts >= c.restart_times:
                    # None when every restart had drop rate 0: keep the
                    # last trained cart (the reference would install its
                    # stale pre-loop cart copy here — btcart.cpp:134-137)
                    if best_cart_snapshot is not None:
                        self._restore_cart(t, k, best_cart_snapshot)
                    best_drop_rate = 0.0
                    pos.reset_scores()
                    neg.reset_scores()
                    self.update_scores(pos, t, k)
                    self.update_scores(neg, t, k)
                    if kk % normalization_step == 0:
                        mean, std = DataSet.calc_mean_std(pos, neg)
                        self.model.mean[t, k] = mean
                        self.model.std[t, k] = std
                        pos.apply_mean_std(mean, std)
                        neg.apply_mean_std(mean, std)
                    else:
                        self.model.mean[t, k] = 0.0
                        self.model.std[t, k] = 1.0
                    # the restored cart's snapshotted th belongs to the
                    # score distribution of the round it was trained in;
                    # after re-scoring with the restored leaves, a stale th
                    # can land anywhere in the new distribution and remove()
                    # would mass-drop positives.  Recompute it so removal
                    # drops exactly drop_n again — the reference keeps the
                    # stale value (the author's own disabled assert at
                    # btcart.cpp:225 documents the mismatch; in one observed
                    # run it silently dropped 70% of all positives in one
                    # cart, flattening recall of the final detector).
                    self.model.cart_th[t, k] = pos.calc_threshold_by_number(
                        drop_n
                    )
                else:
                    pos.reset_scores()
                    neg.reset_scores()
                    continue  # retrain cart k

            best_drop_rate = 0.0
            restarts = 0
            # clear the kept-cart memory: without this, a later cart whose
            # restarts all score 0.0% drop (tmp_drop > best_drop_rate never
            # fires) would install THIS cart's snapshot — foreign splits,
            # foreign leaves, foreign th (the reference leaks its best_cart
            # the same way, btcart.cpp:138,201-208)
            best_cart_snapshot = None
            pos.remove(self.model.cart_th[t, k])
            neg.remove(self.model.cart_th[t, k])
            neg_rejected += neg_n - neg.size
            log(
                f"stage {t+1} cart {kk}/{c.K}: {time.time()-t0:.2f}s, "
                f"pos {pos.size}, neg {neg.size}, "
                f"neg drop {(neg_n-neg.size)/max(neg_n,1)*100:.2f}%"
            )
            if kk != c.K and kk % c.snapshot_iter == 0:
                self.snapshot()
            k += 1

        # global regression over LBF (btcart.cpp:255-292)
        log(f"stage {t+1}: global shape regression")
        pos_live = pos.live_idx()
        neg_live = neg.live_idx()
        pos_lbf = self.gen_lbf(pos, t)
        neg_lbf = (
            self.gen_lbf(neg, t) if neg.size else np.zeros((0, c.K), np.int32)
        )
        has_gt = pos.shape_mask[pos_live] == 1
        valid = pos_live[has_gt]
        resid = pos.shape_residual(valid).astype(np.float32)
        if self.ops is not None:
            from jda_tpu.train.sharded import ridge_lbf_sharded

            W = ridge_lbf_sharded(self.ops, pos_lbf[has_gt], resid, c.lbf_dim)
        else:
            W = RG.ridge_lbf(pos_lbf[has_gt], resid, c.lbf_dim)
        self.model.W[t] = W

        for ds, lbf, lidx in ((pos, pos_lbf, pos_live), (neg, neg_lbf, neg_live)):
            if ds.size == 0:
                continue
            delta = W[lbf].sum(axis=1)  # [size, 2L]
            ds.current_shapes[lidx] += st_apply(ds.stp_mc[lidx], delta)
            ds.invalidate_shapes()  # device mirror is now stale

        err = calc_mean_error(
            pos.gt_shapes[valid],
            pos.current_shapes[valid],
            c.left_pupils,
            c.right_pupils,
        )
        accept = pos.size / max(pos_original, 1)
        reject = neg_rejected / max(neg_rejected + neg_original, 1)
        log(
            f"stage {t+1} done: mean error {err:.4f}, "
            f"accept {accept*100:.2f}%, reject {reject*100:.2f}%"
        )
        self.stats["stages"].append(
            {"stage": t, "mean_error": float(err), "accept": float(accept)}
        )

    def _cart_params(self, t, k):
        m = self.model
        return (
            m.scale[t, k].copy(),
            m.lmk1[t, k].copy(),
            m.lmk2[t, k].copy(),
            m.off1[t, k].copy(),
            m.off2[t, k].copy(),
            m.feat_th[t, k].copy(),
            m.leaf_scores[t, k].copy(),
            m.cart_th[t, k].copy(),
        )

    def _restore_cart(self, t, k, snap):
        m = self.model
        (
            m.scale[t, k],
            m.lmk1[t, k],
            m.lmk2[t, k],
            m.off1[t, k],
            m.off2[t, k],
            m.feat_th[t, k],
            m.leaf_scores[t, k],
            m.cart_th[t, k],
        ) = snap

    # -- top level (JoinCascador::Train, cascador.cpp:33-55) -----------------

    def train(self) -> CascadeParams:
        c = self.c
        for t in range(self.model.stage_idx, c.T):
            self.model.stage_idx = t
            log(f"========== train stage {t+1}/{c.T} ==========")
            self.pos.calc_st_parameters(self.model.mean_shape)
            self.neg.calc_st_parameters(self.model.mean_shape)
            self.train_stage(t)
            # cursor semantics (cascador.hpp:125-139): a completed stage is
            # persisted as (t+1, -1) so resume re-enters at the NEXT stage
            self.model.stage_idx = t + 1
            self.model.cart_idx = -1
            self.snapshot(stage_done=True)
        return self.model

    def snapshot(self, stage_done: bool = False) -> None:
        if not self.snapshot_dir:
            return
        os.makedirs(self.snapshot_dir, exist_ok=True)
        tag = time.strftime("%Y%m%d-%H%M%S")
        t, k = self.model.stage_idx, self.model.cart_idx
        mpath = os.path.join(
            self.snapshot_dir, f"jda_tmp_{tag}_stage_{t+1}_cart_{k+1}.model"
        )
        save_model(self.model, mpath, dtype="double")
        dpath = os.path.join(
            self.snapshot_dir, f"jda_data_{tag}_stage_{t+1}_cart_{k+1}.data"
        )
        DataSet.snapshot(self.pos, self.neg, dpath)
        log(f"snapshot -> {mpath}")
