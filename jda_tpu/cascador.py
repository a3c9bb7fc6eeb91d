"""C++-path detection: JoinCascador::Detect with both fddb methods.

The reference ships two multi-scale scanners (selected by fddb.method,
/root/reference/src/jda/cascador.cpp:431-443):

  * method 0 (detectMultiScale, cascador.cpp:216-308): shrink-image
    pyramid with a fixed window of img_o_size; every window is resized to
    the o/h/q patch triple with cv::resize before validation;
  * method 1 (detectMultiScale1, cascador.cpp:310-376): fixed full-res
    o/h/q images (h = 1/sqrt(2), q = 1/2), growing window from
    fddb_minimum_size, zero-copy ROI patches with true per-scale dims.

Both use C++ semantics: std::round feature coordinates, mean-shape init
(shift_size forced to 0 by the fddb/test commands, src/test.cpp:17,75),
multimap NMS in score order.  TPU mapping: method 1 windows address the
flat image pyramid directly (one geometry batch + dense stage-0 filter);
method 0 builds patch batches on host (the per-window cv::resize is
inherent to its definition) and validates them on device in bulk.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from jda_tpu.config import Config
from jda_tpu.params import CascadeParams
from jda_tpu.detect import Detector, _bucket
from jda_tpu.ops import cascade as C
from jda_tpu.ops import dense0 as D0
from jda_tpu.ops import nms as NMS
from jda_tpu.ops import resize as R


@dataclasses.dataclass
class DetectionStatistic:
    """DetectionStatisic (cascador.hpp:14-25)."""

    patch_n: int = 0
    face_patch_n: int = 0
    nonface_patch_n: int = 0
    cart_gothrough_n: int = 0

    @property
    def average_cart_n(self) -> float:
        return self.cart_gothrough_n / max(self.nonface_patch_n, 1)

    def add(self, other: "DetectionStatistic") -> None:
        self.patch_n += other.patch_n
        self.face_patch_n += other.face_patch_n
        self.nonface_patch_n += other.nonface_patch_n
        self.cart_gothrough_n += other.cart_gothrough_n


class CppDetector:
    """`jda test` / `jda fddb` detection pipeline."""

    def __init__(self, params: CascadeParams, config: Config):
        self.params = params
        self.c = config
        self.det = Detector(params)  # shares jitted kernels + device model
        self._tab_cache: Dict = {}

    # -- method 1: ROI windows over a fixed o/h/q pyramid -------------------

    def _enumerate_m1(self, W: int, H: int):
        c = self.c
        xs, ys, ws, scales = [], [], [], []
        win = c.fddb_minimum_size
        step = c.fddb_step
        while win <= W and win <= H:
            yy = np.arange(0, H - win + 1, step, dtype=np.int32)
            xx = np.arange(0, W - win + 1, step, dtype=np.int32)
            if len(yy) and len(xx):
                gy, gx = np.meshgrid(yy, xx, indexing="ij")
                xs.append(gx.reshape(-1))
                ys.append(gy.reshape(-1))
                ws.append(np.full(gx.size, win, np.int32))
                scales.append((win, step, len(yy), len(xx)))
            win = int(win * c.fddb_scale_factor)
        if not xs:
            z = np.zeros(0, np.int32)
            return z, z, z, []
        return np.concatenate(xs), np.concatenate(ys), np.concatenate(ws), scales

    def _geometry_m1(self, x, y, win, offsets, strides):
        """True per-scale ROI dims (cascador.cpp:335-343): h at
        (int(x/r), int(y/r)) size int(win/r); q at (x/2, y/2) size win/2."""
        r = math.sqrt(2.0)
        hx = (x / r).astype(np.int32)
        hy = (y / r).astype(np.int32)
        base = np.stack(
            [
                offsets[0] + y.astype(np.int64) * strides[0] + x,
                offsets[1] + hy.astype(np.int64) * strides[1] + hx,
                offsets[2] + (y // 2).astype(np.int64) * strides[2] + x // 2,
            ],
            axis=1,
        ).astype(np.int32)
        n = len(x)
        stride = np.broadcast_to(strides[None, :], (n, 3)).astype(np.int32).copy()
        pw = np.stack(
            [win, (win / r).astype(np.int32), win // 2], axis=1
        ).astype(np.int32)
        return {"base": base, "stride": stride, "pw": pw, "ph": pw.copy()}

    def _dense_filter_m1(self, gray, scales):
        """Dense stage-0 filter with C++ rounding semantics; valid because
        single-scale models read only the origin image, where method-1
        windows have pw = ph = win and full-image stride."""
        tabs = []
        det = self.det
        for win, step, _, _ in scales:
            key = (win, step, "round")
            if key not in self._tab_cache:
                self._tab_cache[key] = D0.node_tables(
                    det._ms32, det._host_stage0, win, step, rounding=True
                )
            tabs.append(self._tab_cache[key])
        img_dev = jnp.asarray(gray.astype(np.int32))[None]
        score, alive, nvis = D0.stage0_filter_all_scales(
            img_dev, tuple(tabs), meta=tuple(scales), depth=self.params.tree_depth
        )
        return np.asarray(score[0]), np.asarray(alive[0]), np.asarray(nvis[0])

    def _detect_m1(self, gray: np.ndarray, stat: DetectionStatistic):
        import cv2

        H, W = gray.shape
        r = math.sqrt(2.0)
        img_h = cv2.resize(gray, (int(W / r), int(H / r)))
        img_q = cv2.resize(gray, (W // 2, H // 2))
        flat, offsets, strides = R.stack_pyramid((gray, img_h, img_q))
        flat_dev = jnp.asarray(flat.astype(np.int32))

        x, y, win, scales = self._enumerate_m1(W, H)
        n = len(x)
        if n == 0:
            return np.zeros((0, 4), np.int32), np.zeros(0), np.zeros(
                (0, self.params.landmark_dim)
            )
        geom = self._geometry_m1(x, y, win, offsets, strides)
        dense = (
            self._dense_filter_m1(gray, scales)
            if self.det.single_scale
            else None
        )
        res = self.det._run_batch(
            flat_dev,
            geom,
            n,
            rounding=True,
            dense_result=dense,
            with_stp=self.c.with_similarity_transform,
        )
        alive = res["alive"]
        stat.patch_n += n
        stat.face_patch_n += int(alive.sum())
        stat.nonface_patch_n += int((~alive).sum())
        stat.cart_gothrough_n += int(res["nvis"][~alive].sum())
        keep = np.flatnonzero(alive)
        rects = np.stack([x[keep], y[keep], win[keep], win[keep]], 1).astype(
            np.int32
        )
        return rects, res["score"][keep].astype(np.float64), res["shape"][
            keep
        ].astype(np.float64)

    # -- method 0: shrink pyramid + per-window patch resize ------------------

    def _validate_patches(self, rows: np.ndarray):
        """Batched JoinCascador::Validate on o/h/q patch rows (shift 0)."""
        c = self.c
        dims = (c.img_o_size, c.img_h_size, c.img_q_size)
        m = len(rows)
        b = _bucket(m, 256)
        flat = np.zeros((b, rows.shape[1]), np.int32)
        flat[:m] = rows
        from jda_tpu.train import features as FT

        geom = FT.corpus_geometry(b, dims)
        state = C.init_state(
            b,
            self.det.dev["mean_shape"],
            jnp.asarray(geom["base"]),
            jnp.asarray(geom["stride"]),
            jnp.asarray(geom["pw"]),
            jnp.asarray(geom["ph"]),
            jnp.asarray(np.arange(b) < m),
        )
        out = C.cascade_full(
            self.det.dev,
            jnp.asarray(flat.reshape(-1)),
            state,
            depth=self.params.tree_depth,
            rounding=True,
            leaf_n=self.params.leaf_n,
            T=self.params.T,
            exact=True,
            single_scale=self.det.single_scale,
            with_stp=self.c.with_similarity_transform,
        )
        return (
            np.asarray(out["alive"])[:m],
            np.asarray(out["score"])[:m],
            np.asarray(out["shape"])[:m],
            np.asarray(out["nvis"])[:m],
        )

    def _pyramid_m0(self, gray: np.ndarray) -> List[Tuple[np.ndarray, float]]:
        """The reference shrink chain (cascador.cpp:285-304): level l+1 is
        a cv::resize of level l by 1/fddb_scale_factor.  Returns
        [(level_img, back_scale)]."""
        import cv2

        c = self.c
        win = c.img_o_size
        levels: List[Tuple[np.ndarray, float]] = []
        img, scale = gray, 1.0
        while img.shape[0] >= win and img.shape[1] >= win:
            levels.append((img, scale))
            scale *= c.fddb_scale_factor
            nw = int(img.shape[1] / c.fddb_scale_factor)
            nh = int(img.shape[0] / c.fddb_scale_factor)
            if nw < 1 or nh < 1:
                break
            img = cv2.resize(img, (nw, nh))
        return levels

    def _m0_layout(self, Hc: int, Wc: int) -> List[Tuple[int, int, int]]:
        """Canonical packed-pyramid layout for a (Hc, Wc) canvas: bands
        (y0, h, w) stacked vertically, y0 aligned to fddb_step so the
        dense filter's shifted node tables stay phase-exact
        (ops/dense0.shift_tables)."""
        c = self.c
        win = c.img_o_size
        step = c.fddb_step
        bands: List[Tuple[int, int, int]] = []
        h, w, y0 = Hc, Wc, 0
        while h >= win and w >= win:
            bands.append((y0, h, w))
            y0 = -(-(y0 + h) // step) * step
            nw = int(w / c.fddb_scale_factor)
            nh = int(h / c.fddb_scale_factor)
            if nw < 1 or nh < 1:
                break
            h, w = nh, nw
        return bands

    def _m0_plan(self, B: int, Hc: int, Wc: int) -> dict:
        """Fused plan for the packed method-0 pyramid: one ladder entry per
        band, window grids offset to each band's origin."""
        c = self.c
        det = self.det
        key = (
            "fddb0",
            B,
            Hc,
            Wc,
            c.img_o_size,
            c.fddb_step,
            float(c.fddb_scale_factor),
        )
        plan = det._fused_cache.get(key)
        if plan is None:
            layout = self._m0_layout(Hc, Wc)
            win, step = c.img_o_size, c.fddb_step
            xs, ys, ws, scales, origins = [], [], [], [], []
            for y0, h, w in layout:
                ny = (h - win) // step + 1
                nx = (w - win) // step + 1
                gy, gx = np.meshgrid(
                    y0 + np.arange(ny, dtype=np.int32) * step,
                    np.arange(nx, dtype=np.int32) * step,
                    indexing="ij",
                )
                xs.append(gx.reshape(-1))
                ys.append(gy.reshape(-1))
                ws.append(np.full(gx.size, win, np.int32))
                scales.append((win, step, ny, nx))
                origins.append((int(y0), 0))
            if not layout:
                x = y = wn = np.zeros(0, np.int32)
            else:
                x = np.concatenate(xs)
                y = np.concatenate(ys)
                wn = np.concatenate(ws)
            Hp = (layout[-1][0] + layout[-1][1]) if layout else Hc
            plan = det._fused_plan_windows(
                key, B, Hp, Wc, x, y, wn, tuple(scales), rounding=True,
                origins=tuple(origins),
            )
            plan["m0_layout"] = layout
            plan["m0_band"] = (
                np.concatenate(
                    [
                        np.full(ny * nx, i, np.int32)
                        for i, (_, _, ny, nx) in enumerate(scales)
                    ]
                )
                if scales
                else np.zeros(0, np.int32)
            )
        return det._fused_compile(plan)

    def _m0_fast_applicable(self) -> bool:
        # banded (origin-carrying) plans force the grouped MXU program
        # inside _fused_plan_windows, so the JDA_TPU_TAIL default is
        # irrelevant here
        return self.det.single_scale and self.det._fused_enabled()

    def _detect_m0_raw_batch(self, grays, canon=None):
        """Packed-pyramid method-0 over an image batch: every level of
        every image rides ONE fused dispatch (the per-window cv::resize of
        cascador.cpp:243-245 degenerates to a direct crop for single-scale
        models: the scan window IS img_o_size, and h/q patches are never
        read).  Returns per image (rects, scores, shapes_rel, stat) —
        pre-NMS, shapes window-relative, exactly _detect_m0_host's raw
        contract."""
        c = self.c
        det = self.det
        B = len(grays)
        win, step = c.img_o_size, c.fddb_step
        Hc = max(g.shape[0] for g in grays)
        Wc = max(g.shape[1] for g in grays)
        if canon is not None:
            Hc, Wc = max(Hc, canon[0]), max(Wc, canon[1])
        plan = self._m0_plan(B, Hc, Wc)
        layout = plan["m0_layout"]
        nb = len(layout)
        L2 = self.params.landmark_dim
        TK = self.params.T * self.params.K

        def empty():
            return (
                np.zeros((0, 4), np.int32),
                np.zeros(0),
                np.zeros((0, L2)),
                DetectionStatistic(),
            )

        if plan["n"] == 0 or nb == 0:
            return [empty() for _ in grays]

        Hp = plan["Hc"]
        imgs = np.zeros((B, Hp, Wc), np.uint8)
        dims = np.zeros((B, nb, 2), np.int32)
        backs = np.ones((B, nb), np.float64)
        for i, g in enumerate(grays):
            for li, (img, sc) in enumerate(self._pyramid_m0(g)):
                y0 = layout[li][0]
                imgs[i, y0 : y0 + img.shape[0], : img.shape[1]] = img
                dims[i, li] = (img.shape[1], img.shape[0])
                backs[i, li] = sc
        out = det._fused_run(plan, imgs, dims)
        sel = np.asarray(out["sel"])
        score = np.asarray(out["score"])
        shape = np.asarray(out["shape"])
        alive = np.asarray(out["alive"])
        # exact per-image visit banks from the fused program (the
        # reference's per-image stat, test.cpp:146-149)
        nvis_img = np.asarray(out["nvis_img"])

        n = plan["n"]
        x, y = plan["x"], plan["y"]
        band = plan["m0_band"]
        y0s = np.asarray([b[0] for b in layout], np.int32)
        keep = (sel >= 0) & alive
        bi = np.where(sel >= 0, sel // n, -1)
        wi = np.where(sel >= 0, sel % n, 0)

        mask_ns, nonface_counts = [], []
        for i in range(B):
            d = dims[i]
            ok = d >= win
            m_n = int(
                np.sum(
                    np.where(
                        ok.all(axis=1),
                        ((d[:, 1] - win) // step + 1)
                        * ((d[:, 0] - win) // step + 1),
                        0,
                    )
                )
            )
            mask_ns.append(m_n)
            nonface_counts.append(m_n - int((keep & (bi == i)).sum()))

        results = []
        for i in range(B):
            m = keep & (bi == i)
            cand = wi[m]
            bnd = band[cand]
            back = backs[i, bnd]
            rx = (x[cand] * back).astype(np.int32)
            ry = ((y[cand] - y0s[bnd]) * back).astype(np.int32)
            rs = (win * back).astype(np.int32)
            rects = np.stack([rx, ry, rs, rs], 1).astype(np.int32)
            stat = DetectionStatistic(
                patch_n=mask_ns[i],
                face_patch_n=len(cand),
                nonface_patch_n=nonface_counts[i],
                cart_gothrough_n=int(nvis_img[i]) - len(cand) * TK,
            )
            results.append(
                (
                    rects,
                    score[m].astype(np.float64),
                    shape[m].astype(np.float64),
                    stat,
                )
            )
        return results

    def _detect_m0(self, gray: np.ndarray, stat: DetectionStatistic):
        if self._m0_fast_applicable():
            rects, scores, shapes, st = self._detect_m0_raw_batch([gray])[0]
            stat.add(st)
            return rects, scores, shapes
        if self._m0_dense_ms_applicable():
            return self._detect_m0_dense_ms(gray, stat)
        return self._detect_m0_host(gray, stat)

    def _m0_dense_ms_applicable(self) -> bool:
        import os

        return (
            not self.det.single_scale
            and self.params.T > 0
            and os.environ.get("JDA_TPU_M0_DENSE_MS", "1") != "0"
            and self._cv_resize_model_ok()
        )

    def _cv_resize_model_ok(self) -> bool:
        """One-time self-check: the dense multi-scale tables bake in a
        software model of cv2.resize (ops/resize.resize_bilinear_cv_exact,
        derived from OpenCV's SIMD vertical-pass arithmetic); some OpenCV
        builds take the scalar FixedPtCast tail on certain widths, which
        can differ by 1 LSB.  Verify the model against the *installed* cv2
        on the actual (win -> o/h/q) shapes; on any mismatch the detector
        silently uses the per-window host path instead (bit-exactness of
        _detect_m0_dense_ms vs _detect_m0_host is the contract)."""
        ok = getattr(self, "_cv_resize_ok", None)
        if ok is None:
            from jda_tpu.ops.resize import resize_bilinear_cv_exact

            try:
                import cv2
            except ImportError:
                self._cv_resize_ok = False
                return False
            c = self.c
            rng = np.random.default_rng(0)
            roi = rng.integers(0, 256, (c.img_o_size, c.img_o_size), np.uint8)
            ok = True
            for d in (c.img_o_size, c.img_h_size, c.img_q_size):
                want = cv2.resize(roi, (d, d))
                got = resize_bilinear_cv_exact(roi, d, d)
                if not np.array_equal(want, got):
                    ok = False
                    break
            self._cv_resize_ok = ok
        return self._cv_resize_ok

    def _detect_m0_dense_ms(self, gray: np.ndarray, stat: DetectionStatistic):
        """Method-0 detection for MULTI-SCALE models through the dense
        stage-0 filter: each h/q feature pixel of a resized window patch is
        a fixed 4-tap OpenCV-exact combination of scan-level pixels
        (ops/dense0.node_tables_ms), so stage 0 runs densely over the
        packed pyramid with zero gathers; only stage-0 survivors (typically
        <1%) pay the per-window cv::resize + full-cascade tail
        (cascador.cpp:216-262 semantics, bit-exact vs _detect_m0_host)."""
        import cv2

        c = self.c
        det = self.det
        win, step = c.img_o_size, c.fddb_step
        L2 = self.params.landmark_dim

        def empty():
            return (
                np.zeros((0, 4), np.int32),
                np.zeros(0),
                np.zeros((0, L2)),
            )

        levels = self._pyramid_m0(gray)
        layout = self._m0_layout(gray.shape[0], gray.shape[1])
        if not levels or not layout:
            return empty()
        key = ("ms0", win, step)
        if key not in self._tab_cache:
            self._tab_cache[key] = D0.node_tables_ms(
                det._ms32,
                det._host_stage0,
                win,
                step,
                (c.img_o_size, c.img_h_size, c.img_q_size),
                rounding=True,
            )
        base_tab = self._tab_cache[key]
        Hp = layout[-1][0] + layout[-1][1]
        Wc = gray.shape[1]
        canvas = np.zeros((Hp, Wc), np.uint8)
        metas, tabs, xs_all, ys_all, lvl_all = [], [], [], [], []
        for li, ((y0, h, w), (img, _back)) in enumerate(zip(layout, levels)):
            canvas[y0 : y0 + img.shape[0], : img.shape[1]] = img
            ny = (h - win) // step + 1
            nx = (w - win) // step + 1
            metas.append((win, step, ny, nx))
            tabs.append(D0.shift_tables(base_tab, y0, 0, step))
            gy, gx = np.meshgrid(
                np.arange(ny, dtype=np.int32) * step,
                np.arange(nx, dtype=np.int32) * step,
                indexing="ij",
            )
            xs_all.append(gx.reshape(-1))
            ys_all.append(gy.reshape(-1))
            lvl_all.append(np.full(gx.size, li, np.int32))
        x = np.concatenate(xs_all)
        y = np.concatenate(ys_all)
        lvl = np.concatenate(lvl_all)
        img_dev = jnp.asarray(canvas.astype(np.int32))[None]
        score0, alive0, nvis0 = D0.stage0_filter_all_scales_ms(
            img_dev,
            tuple(tabs),
            meta=tuple(metas),
            depth=self.params.tree_depth,
        )
        alive0 = np.asarray(alive0[0])
        nvis0 = np.asarray(nvis0[0])
        n = len(x)
        stat.patch_n += n
        reject_nvis = int(nvis0[~alive0].sum())
        surv = np.flatnonzero(alive0)
        if len(surv) == 0:
            stat.nonface_patch_n += n
            stat.cart_gothrough_n += reject_nvis
            return empty()
        # survivors: per-window patch synthesis (host cv2, exactly the
        # host path's rows) + full-cascade revalidation; stage 0 re-runs
        # bit-exactly on the resized patches, so dense + tail == host path
        D = sum(d * d for d in (c.img_o_size, c.img_h_size, c.img_q_size))
        rows = np.zeros((len(surv), D), np.uint8)
        for r, wi_ in enumerate(surv):
            img = levels[lvl[wi_]][0]
            roi = img[y[wi_] : y[wi_] + win, x[wi_] : x[wi_] + win]
            o = cv2.resize(roi, (c.img_o_size, c.img_o_size))
            hh = cv2.resize(roi, (c.img_h_size, c.img_h_size))
            qq = cv2.resize(roi, (c.img_q_size, c.img_q_size))
            rows[r] = np.concatenate(
                [o.reshape(-1), hh.reshape(-1), qq.reshape(-1)]
            )
        alive, score, shape, nvis = self._validate_patches(rows)
        stat.face_patch_n += int(alive.sum())
        stat.nonface_patch_n += n - int(alive.sum())
        stat.cart_gothrough_n += reject_nvis + int(nvis[~alive].sum())
        keep = np.flatnonzero(alive)
        if not len(keep):
            return empty()
        sw = surv[keep]
        backs = np.asarray([b for _, b in levels], np.float64)[lvl[sw]]
        rects = np.stack(
            [
                (x[sw] * backs).astype(np.int32),
                (y[sw] * backs).astype(np.int32),
                (win * backs).astype(np.int32),
                (win * backs).astype(np.int32),
            ],
            1,
        ).astype(np.int32)
        return (
            rects,
            score[keep].astype(np.float64),
            shape[keep].astype(np.float64),
        )

    def _detect_m0_host(self, gray: np.ndarray, stat: DetectionStatistic):
        import cv2

        c = self.c
        win = c.img_o_size
        step = c.fddb_step
        factor = c.fddb_scale_factor
        img = gray.copy()
        scale = 1.0
        all_rects: List[np.ndarray] = []
        all_scores: List[np.ndarray] = []
        all_shapes: List[np.ndarray] = []
        D = sum(
            d * d for d in (c.img_o_size, c.img_h_size, c.img_q_size)
        )
        while img.shape[0] >= win and img.shape[1] >= win:
            ys = np.arange(0, img.shape[0] - win + 1, step)
            xs = np.arange(0, img.shape[1] - win + 1, step)
            gy, gx = np.meshgrid(ys, xs, indexing="ij")
            gx = gx.reshape(-1)
            gy = gy.reshape(-1)
            rows = np.zeros((len(gx), D), np.uint8)
            for i, (wx, wy) in enumerate(zip(gx, gy)):
                roi = img[wy : wy + win, wx : wx + win]
                o = cv2.resize(roi, (c.img_o_size, c.img_o_size))
                h = cv2.resize(roi, (c.img_h_size, c.img_h_size))
                q = cv2.resize(roi, (c.img_q_size, c.img_q_size))
                rows[i] = np.concatenate(
                    [o.reshape(-1), h.reshape(-1), q.reshape(-1)]
                )
            if len(rows):
                alive, score, shape, nvis = self._validate_patches(rows)
                stat.patch_n += len(rows)
                stat.face_patch_n += int(alive.sum())
                stat.nonface_patch_n += int((~alive).sum())
                stat.cart_gothrough_n += int(nvis[~alive].sum())
                keep = np.flatnonzero(alive)
                if len(keep):
                    rects = np.stack(
                        [
                            (gx[keep] * scale).astype(np.int32),
                            (gy[keep] * scale).astype(np.int32),
                            np.full(len(keep), int(win * scale), np.int32),
                            np.full(len(keep), int(win * scale), np.int32),
                        ],
                        1,
                    )
                    all_rects.append(rects)
                    all_scores.append(score[keep].astype(np.float64))
                    all_shapes.append(shape[keep].astype(np.float64))
            scale *= factor
            nw = int(img.shape[1] / factor)
            nh = int(img.shape[0] / factor)
            if nw < 1 or nh < 1:
                break
            img = cv2.resize(img, (nw, nh))
        if not all_rects:
            return (
                np.zeros((0, 4), np.int32),
                np.zeros(0),
                np.zeros((0, self.params.landmark_dim)),
            )
        return (
            np.concatenate(all_rects),
            np.concatenate(all_scores),
            np.concatenate(all_shapes),
        )

    # -- batched method-1 detection (the fddb throughput path) ---------------

    def detect_batch(
        self, grays: List[np.ndarray]
    ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray, DetectionStatistic]]:
        """Batched `jda fddb` detection: every image of the batch shares one
        fused device dispatch (ops/fused.py) on a canonical method-1 window
        ladder with C++ rounding semantics.  Exact for single-scale models
        (method-1 windows read only the origin plane then); multi-scale or
        method-0 configs fall back to per-image detect().  The reference
        gets its fddb throughput from the OpenMP fold loop
        (src/test.cpp:100-101); here images ARE the batch axis."""
        c = self.c
        if c.fddb_detect_method == 0:
            if self._m0_fast_applicable():
                return self._detect_batch_m0(grays)
            return [self.detect(g) for g in grays]
        if not (self.det.single_scale and self.det._fused_enabled()):
            return [self.detect(g) for g in grays]
        return self._detect_batch_m1(grays)

    def _detect_batch_m0(self, grays, canon: Optional[Tuple[int, int]] = None):
        """Batched `jda fddb` method-0: packed pyramids ride one fused
        dispatch, then per-image NMS + landmark relocation (the same final
        block as detect(), cascador.cpp:448-474)."""
        c = self.c
        results = []
        for rects, scores, shapes, stat in self._detect_m0_raw_batch(
            grays, canon=canon
        ):
            if c.fddb_nms:
                picked = NMS.nms_cpp(rects, scores, c.fddb_overlap)
            else:
                picked = np.arange(len(rects))
            rects = rects[picked]
            scores = scores[picked]
            shapes = shapes[picked].copy()
            shapes[:, 0::2] = rects[:, 0:1] + shapes[:, 0::2] * rects[:, 2:3]
            shapes[:, 1::2] = rects[:, 1:2] + shapes[:, 1::2] * rects[:, 3:4]
            results.append((rects, scores, shapes, stat))
        return results

    def _detect_batch_m1(self, grays, canon: Optional[Tuple[int, int]] = None):
        import numpy as np

        c = self.c
        det = self.det
        B = len(grays)
        Hc = max(g.shape[0] for g in grays)
        Wc = max(g.shape[1] for g in grays)
        if canon is not None:
            Hc, Wc = max(Hc, canon[0]), max(Wc, canon[1])
        key = (
            "fddb1",
            B,
            Hc,
            Wc,
            c.fddb_minimum_size,
            c.fddb_step,
            float(c.fddb_scale_factor),
        )
        plan = det._fused_cache.get(key)
        if plan is None:
            x, y, win, scales = self._enumerate_m1(Wc, Hc)
            plan = det._fused_plan_windows(
                key, B, Hc, Wc, x, y, win, tuple(scales), rounding=True
            )
        plan = det._fused_compile(plan)
        L2 = self.params.landmark_dim
        TK = self.params.T * self.params.K

        def empty():
            return (
                np.zeros((0, 4), np.int32),
                np.zeros(0),
                np.zeros((0, L2)),
                DetectionStatistic(),
            )

        if plan["n"] == 0:
            return [empty() for _ in grays]

        imgs_u8 = np.zeros((B, Hc, Wc), np.uint8)
        for i, g in enumerate(grays):
            imgs_u8[i, : g.shape[0], : g.shape[1]] = g
        dims = np.array([[g.shape[1], g.shape[0]] for g in grays], np.int32)
        out = det._fused_run(plan, imgs_u8, dims)
        sel = np.asarray(out["sel"])
        score = np.asarray(out["score"])
        shape = np.asarray(out["shape"])
        alive = np.asarray(out["alive"])
        # exact per-image visit banks (test.cpp:146-149 semantics)
        nvis_img = np.asarray(out["nvis_img"])

        n = plan["n"]
        x, y, win = plan["x"], plan["y"], plan["win"]
        keep = (sel >= 0) & alive  # method 1 has no final score threshold
        bi = np.where(sel >= 0, sel // n, -1)
        wi = np.where(sel >= 0, sel % n, 0)
        results = []
        for i, g in enumerate(grays):
            mask_n = int(((x <= g.shape[1] - win) & (y <= g.shape[0] - win)).sum())
            m = keep & (bi == i)
            cand = wi[m]
            rects = np.stack(
                [x[cand], y[cand], win[cand], win[cand]], 1
            ).astype(np.int32)
            scores_i = score[m].astype(np.float64)
            shapes_i = shape[m].astype(np.float64)
            stat = DetectionStatistic(
                patch_n=mask_n,
                face_patch_n=len(cand),
                nonface_patch_n=mask_n - len(cand),
                cart_gothrough_n=int(nvis_img[i]) - len(cand) * TK,
            )
            if c.fddb_nms:
                picked = NMS.nms_cpp(rects, scores_i, c.fddb_overlap)
            else:
                picked = np.arange(len(rects))
            rects = rects[picked]
            scores_i = scores_i[picked]
            shapes_i = shapes_i[picked].copy()
            shapes_i[:, 0::2] = rects[:, 0:1] + shapes_i[:, 0::2] * rects[:, 2:3]
            shapes_i[:, 1::2] = rects[:, 1:2] + shapes_i[:, 1::2] * rects[:, 3:4]
            results.append((rects, scores_i, shapes_i, stat))
        return results

    # -- public: JoinCascador::Detect (cascador.cpp:431-477) ----------------

    def detect(
        self, gray: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, DetectionStatistic]:
        """Returns (rects [n,4], scores [n], shapes [n,2L] absolute,
        statistic)."""
        assert gray.dtype == np.uint8 and gray.ndim == 2
        c = self.c
        stat = DetectionStatistic()
        if c.fddb_detect_method == 0:
            rects, scores, shapes = self._detect_m0(gray, stat)
        else:
            rects, scores, shapes = self._detect_m1(gray, stat)

        if c.fddb_nms:
            picked = NMS.nms_cpp(rects, scores, c.fddb_overlap)
        else:
            picked = np.arange(len(rects))
        rects = rects[picked]
        scores = scores[picked]
        shapes = shapes[picked].copy()
        shapes[:, 0::2] = rects[:, 0:1] + shapes[:, 0::2] * rects[:, 2:3]
        shapes[:, 1::2] = rects[:, 1:2] + shapes[:, 1::2] * rects[:, 3:4]
        return rects, scores, shapes, stat
