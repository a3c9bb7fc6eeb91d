"""Multi-scale sliding-window detection.

Semantics follow the reference C API `jdaDetect`
(/root/reference/c/jda.c:318-480):

  * o/h/q pyramid built once per image (h = 1/sqrt(2), q = 1/2 scale);
  * window sizes grow from 24 px by `scale`; slide step = int(0.1 * win)
    (the `step` argument is shadowed in the reference, c/jda.c:333 — we
    reproduce that: the parameter is accepted and ignored);
  * every window borrows memory from the pyramid (no per-window resize);
    patch width is win_size at all three scales (reference quirk);
  * shape starts at the mean shape; carts are evaluated in lockstep with
    masked early exit; per-stage regression is a one-hot matmul;
  * final score threshold, greedy NMS (overlap 0.3), landmark relocation.

TPU-native structure: all (scale, x, y) candidates are enumerated up front
and evaluated as device batches.  Stage 0 sees every window; survivors are
compacted on host between stages (cascades reject >99% of windows in the
first stage, so stages 1+ run on tiny batches).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from jda_tpu.params import CascadeParams
from jda_tpu.ops import cascade as C
from jda_tpu.ops import dense0 as D0
from jda_tpu.ops import fused as F
from jda_tpu.ops import resize as R
from jda_tpu.ops import nms as NMS


@dataclasses.dataclass
class DetectionResult:
    """Mirror of jdaResult (/root/reference/c/jda.h:18-24)."""

    n: int
    landmark_n: int
    bboxes: np.ndarray  # [n, 3] int32 (x, y, size)
    shapes: np.ndarray  # [n, 2L] float32, absolute image coords
    scores: np.ndarray  # [n] float32


def _grown_budgets(budgets, counts) -> tuple:
    """Budgets after an overflow: every overflowed entry jumps to its
    measured population (+25%, 256-rounded), and entries DOWNSTREAM of an
    overflowed one are scaled by the same growth ratio — their reported
    counts were measured under the clipped upstream population, so growing
    only the overflowed entry re-overflows one entry per recompile (a
    staged-reveal ladder of ~minutes-each compiles).  Overshoot is cheap:
    the post-stream trim reclaims it."""
    new = list(budgets)
    ratio = 1.0
    for i, b in enumerate(budgets):
        if ratio > 1.0:
            new[i] = max(
                new[i], (int(b * ratio) + 255) // 256 * 256
            )
        c = int(counts[i])
        if c > new[i]:
            grown = (c * 5 // 4 + 255) // 256 * 256
            ratio = max(ratio, grown / max(b, 1))
            new[i] = max(new[i], grown)
    return tuple(new)


def enumerate_windows(
    img_w: int,
    img_h: int,
    scale: float,
    min_size: int,
    max_size: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[Tuple[int, int, int, int]]]:
    """All candidate (x, y, win) in the reference's scan order
    (c/jda.c:331-339: win outer, y middle, x inner; step = int(win*0.1)).

    Also returns per-scale metadata [(win, step, ny, nx), ...] — the grid
    shape of each scan scale, consumed by the dense stage-0 filter.
    """
    xs: List[np.ndarray] = []
    ys: List[np.ndarray] = []
    ws: List[np.ndarray] = []
    scales: List[Tuple[int, int, int, int]] = []
    win = 24
    scale32 = np.float32(scale)
    while win < min_size:
        win = int(np.float32(win) * scale32)
    while win <= max_size:
        step = int(np.float32(win) * np.float32(0.1))
        step = max(step, 1)
        yy = np.arange(0, img_h - win + 1, step, dtype=np.int32)
        xx = np.arange(0, img_w - win + 1, step, dtype=np.int32)
        if len(yy) and len(xx):
            gy, gx = np.meshgrid(yy, xx, indexing="ij")
            xs.append(gx.reshape(-1))
            ys.append(gy.reshape(-1))
            ws.append(np.full(gx.size, win, np.int32))
            scales.append((win, step, len(yy), len(xx)))
        win = int(np.float32(win) * scale32)
    if not xs:
        z = np.zeros((0,), np.int32)
        return z, z, z, []
    return np.concatenate(xs), np.concatenate(ys), np.concatenate(ws), scales


def window_geometry(
    x: np.ndarray,
    y: np.ndarray,
    win: np.ndarray,
    offsets: np.ndarray,
    strides: np.ndarray,
) -> Dict[str, np.ndarray]:
    """Per-window flat base/stride/patch dims for the three pyramid levels.

    Matches the borrowed-memory patches of c/jda.c:340-354: level o at
    (x, y); level h at (int(x*r), int(y*r)) with r = 1/sqrt(2) in float32;
    level q at (x/2, y/2); all three claim width = height = win.
    """
    n = x.shape[0]
    r = np.float32(1.0) / np.float32(math.sqrt(2.0))
    hx = (x.astype(np.float32) * r).astype(np.int32)
    hy = (y.astype(np.float32) * r).astype(np.int32)
    qx = x // 2
    qy = y // 2
    base = np.stack(
        [
            offsets[0] + y.astype(np.int64) * strides[0] + x,
            offsets[1] + hy.astype(np.int64) * strides[1] + hx,
            offsets[2] + qy.astype(np.int64) * strides[2] + qx,
        ],
        axis=1,
    ).astype(np.int32)
    stride = np.broadcast_to(strides[None, :], (n, 3)).astype(np.int32)
    pw = np.broadcast_to(win[:, None], (n, 3)).astype(np.int32)
    return {"base": base, "stride": stride, "pw": pw, "ph": pw.copy()}


def _bucket(n: int, minimum: int = 256) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class Detector:
    """TPU detector over a loaded cascade (API of c/jda.h:62-63).

    Pipeline per geometry batch:
      1. *prefilter*: the first `prefilter_carts` carts of stage 0 run on
         every window (wide descent, jda_tpu/ops/cascade.py); survivors are
         compacted on host.  This recovers the reference's early-exit
         economics (cascador.cpp:188-191) at lockstep batch granularity —
         the full 2700-cart cascade then only sees the few % of windows
         that pass the prefix.
      2. per stage: full-K wide chunk + score chain + one-hot regression,
         compacting survivors between stages.
    Re-running carts [0, prefilter) on survivors is exact: tree descent
    depends only on the (unchanged within a stage) shape, and the score
    chain recomputes the identical float sequence from zero.
    """

    SLAB = 1 << 16  # windows per prefilter dispatch (bounds temp memory)
    CART_CHUNK = 180  # carts per dispatch (bounds [N, C] temp memory)

    def __init__(
        self,
        params: CascadeParams,
        final_th_default: float = 0.0,
        prefilter_carts: int = 64,
        rounding: bool = False,
    ):
        # rounding=False reproduces the C API's coordinate truncation
        # (c/jda.c:375-381); rounding=True uses the C++ training semantics
        # (data.cpp:48-51) — required for models whose features are
        # pixel-exact-sensitive (e.g. synthetic-trained), since the
        # reference's own C library inherits this trunc-vs-round duality
        self.rounding = bool(rounding)
        self.params = params
        self.dev = params.device_arrays(np.float32)
        self.T = params.T
        self.K = params.K
        self.depth = params.tree_depth
        self.leaf_n = params.leaf_n
        self.final_th_default = final_th_default
        self.single_scale = bool((params.scale == 0).all())
        self.prefilter_carts = min(prefilter_carts, self.K)
        self.pre_chunk = (
            {
                k: v[0, : self.prefilter_carts]
                for k, v in self.dev.items()
                if k not in ("W", "mean_shape")
            }
            if self.T > 0
            else None
        )
        # per-stage cart chunks, pre-sliced on device
        self.stage_chunks = []
        for t in range(self.T):
            sp = C.stage_params(self.dev, t)
            chunks = []
            for c0 in range(0, self.K, self.CART_CHUNK):
                c1 = min(c0 + self.CART_CHUNK, self.K)
                chunks.append({k: v[c0:c1] for k, v in sp.items()})
            self.stage_chunks.append(chunks)
        self._stage_jit = jax.jit(
            self._stage_impl, static_argnames=("depth", "rounding", "single_scale")
        )
        self._regress_jit = jax.jit(self._regress_impl, static_argnames=("leaf_n",))
        # host copies of stage-0 params for the dense filter's crop tables
        if self.T > 0:
            p32 = params.astype(np.float32)
            self._host_stage0 = {
                "scale": params.scale[0],
                "lmk1": params.lmk1[0],
                "lmk2": params.lmk2[0],
                "off1": p32.off1[0],
                "off2": p32.off2[0],
                "feat_th": params.feat_th[0],
                "leaf_scores": p32.leaf_scores[0],
                "mean": p32.mean[0],
                "std": p32.std[0],
                "cart_th": p32.cart_th[0],
            }
            self._ms32 = params.mean_shape.astype(np.float32)
        self._tab_cache: Dict[Tuple[int, int], Dict[str, np.ndarray]] = {}
        self._fused_cache: Dict[tuple, dict] = {}  # plan key -> fused program

    def _dense_filter(
        self, gray: np.ndarray, scales: List[Tuple[int, int, int, int]]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Full stage-0 rejection over all scan scales in one dispatch
        (ops/dense0.py).  Returns host (score, alive, nvis) in window
        enumeration order."""
        # experimental pallas kernel (ops/dense0.py): blocked on Mosaic
        # tile-alignment for dynamic crop offsets; off by default
        import os

        use_pallas = (
            os.environ.get("JDA_TPU_DENSE_PALLAS") == "1"
            and jax.default_backend() == "tpu"
        )
        tabs = []
        for win, step, _, _ in scales:
            # key schema shared with _fused_plan_windows: (win, step,
            # rounding) holds raw node tables; the packed variant gets its
            # own slot ("packed" discriminator avoids cross-schema clashes)
            key = (
                (win, step, self.rounding, "packed")
                if use_pallas
                else (win, step, self.rounding)
            )
            if key not in self._tab_cache:
                t = D0.node_tables(
                    self._ms32, self._host_stage0, win, step,
                    rounding=self.rounding,
                )
                if use_pallas:
                    t = D0.pack_tables(t, self.params.node_n)
                self._tab_cache[key] = t
            tabs.append(self._tab_cache[key])
        if use_pallas:
            img_dev = jnp.asarray(gray.astype(np.int32))
            score, alive, nvis = D0.stage0_filter_all_scales_pallas(
                img_dev,
                tuple(t[0] for t in tabs),
                tuple(t[1] for t in tabs),
                meta=tuple(scales),
                depth=self.depth,
            )
            return np.asarray(score), np.asarray(alive), np.asarray(nvis)
        img_dev = jnp.asarray(gray.astype(np.int32))[None]
        score, alive, nvis = D0.stage0_filter_all_scales(
            img_dev, tuple(tabs), meta=tuple(scales), depth=self.depth
        )
        return (
            np.asarray(score[0]),
            np.asarray(alive[0]),
            np.asarray(nvis[0]),
        )

    @staticmethod
    def _stage_impl(sp, flat_img, state, *, depth, rounding, single_scale, stp=None):
        return C.run_cart_chunk(
            sp,
            flat_img,
            state,
            depth=depth,
            rounding=rounding,
            single_scale=single_scale,
            stp=stp,
        )

    @staticmethod
    def _regress_impl(W_t, leaves, state, *, leaf_n, stp=None):
        return C.apply_regression(W_t, leaves, state, leaf_n=leaf_n, stp=stp)

    # -- fused single-dispatch pipeline -------------------------------------

    def _fused_enabled(self) -> bool:
        import os

        return (
            self.single_scale
            and self.T > 0
            and os.environ.get("JDA_TPU_FUSED", "1") != "0"
        )

    def _dense_pallas_enabled(self) -> bool:
        import os

        return (
            os.environ.get("JDA_TPU_DENSE_PALLAS", "1") != "0"
            and jax.default_backend() == "tpu"
        )

    def _fused_plan(self, B, Hc, Wc, scale, min_size, max_size_c) -> dict:
        """Static plan (window tables + compiled program) for the C-API
        window ladder (jdaDetect semantics, truncation)."""
        key = ("c", B, Hc, Wc, float(scale), min_size, max_size_c,
               self.rounding)
        plan = self._fused_cache.get(key)
        if plan is None:
            x, y, win, scales = enumerate_windows(
                Wc, Hc, scale, min_size, max_size_c
            )
            plan = self._fused_plan_windows(
                key, B, Hc, Wc, x, y, win, scales, rounding=self.rounding
            )
        return self._fused_compile(plan)

    # -- persistent budget store ------------------------------------------
    # Survivor-lane budgets are shapes, so every budget change recompiles
    # the fused program (~minutes cold over the tunnel).  Remembering the
    # settled (trimmed or grown) budgets per plan key next to the XLA
    # compilation cache means a fresh process builds the settled program
    # directly — one compile per plan per machine, and that compile is a
    # cache hit once any process has made it.  Best-effort: any IO error
    # just falls back to defaults, and overflow-growth still protects a
    # stale entry.

    def _budget_store(self):
        d = jax.config.jax_compilation_cache_dir
        return os.path.join(d, "jda_budgets.json") if d else None

    def _budget_key(self, key) -> str:
        import hashlib

        model_h = hashlib.sha1(
            np.ascontiguousarray(self.params.cart_th).tobytes()
            + np.ascontiguousarray(self.params.feat_th).tobytes()
        ).hexdigest()[:12]
        mode = (
            os.environ.get("JDA_TPU_TAIL", "gather"),
            self._canvas_mode(),
            os.environ.get("JDA_TPU_S0LBF", "1"),
            os.environ.get("JDA_TPU_BUCKETS", "none"),
        )
        return repr((key, mode, model_h))

    def _budget_load(self, key, n_entries: int):
        # trim disabled => stay on the deterministic default budgets
        # (stored values are trim/grow products; loading them would
        # recompile plans the defaults already have cached)
        if os.environ.get("JDA_TPU_BUDGET_TRIM", "1") == "0":
            return None
        path = self._budget_store()
        if path is None:
            return None
        try:
            import json

            with open(path) as f:
                store = json.load(f)
            v = store.get(self._budget_key(key))
            if v is not None and len(v) == n_entries:
                return tuple(int(b) for b in v)
        except (OSError, ValueError):
            pass
        return None

    def _budget_save(self, plan):
        path = self._budget_store()
        if path is None:
            return
        try:
            import json

            store = {}
            if os.path.exists(path):
                with open(path) as f:
                    store = json.load(f)
            store[plan["bkey"]] = list(plan["budgets"])
            tmp = path + ".tmp.%d" % os.getpid()
            with open(tmp, "w") as f:
                json.dump(store, f)
            os.replace(tmp, path)
        except (OSError, ValueError):
            pass

    def _mxu_tail_enabled(self) -> bool:
        # Round-3 A/B on the real chip (scripts/tune_detect.py): the plain
        # gather tail runs VGA at 11.91 img/s vs 6.3-7.0 for every MXU
        # canvas mode, so gather is the default; banded scans (1080p)
        # still force the grouped MXU program, which is the only one that
        # understands canvas origins.
        import os

        return os.environ.get("JDA_TPU_TAIL", "gather") != "gather"

    def _canvas_mode(self) -> str:
        """Survivor-canvas materialization: gather | rows
        (ops/fused.make_fused_fn2).  The former "pallas" DMA canvas was
        removed in round 5: it faulted the TPU worker process inside the
        fused program (PERF.md r4) and lost every A/B it appeared in;
        unknown values degrade to rows with a warning."""
        import os

        mode = os.environ.get("JDA_TPU_CANVAS", "rows")
        if mode not in ("gather", "rows"):
            from jda_tpu.utils import LOG

            LOG(
                "JDA_TPU_CANVAS=%s is not a supported mode "
                "(gather | rows); using rows" % mode
            )
            return "rows"
        return mode

    def _s0_lbf_enabled(self) -> bool:
        """Dense filter emits packed stage-0 leaf words so the survivor
        tail skips the stage-0 re-descent (K * 3 nodes * 2 pixel gathers
        per lane) and jumps straight to the stage-0 regression."""
        import os

        return os.environ.get("JDA_TPU_S0LBF", "1") != "0"

    def _fused_plan_windows(
        self, key, B, Hc, Wc, x, y, win, scales, rounding: bool,
        origins=None,
    ) -> dict:
        """Build + cache a fused plan from an explicit window ladder (used
        by the C-API ladder, the fddb method-1 ladder, and banded scans —
        origins gives each scale entry a canvas origin (y0, x0), see
        ops/fused.make_fused_fn2)."""
        use_pallas = self._dense_pallas_enabled()
        tabs = []
        for i, (w_, s_, _, _) in enumerate(scales):
            tkey = (w_, s_, rounding)
            if tkey not in self._tab_cache:
                self._tab_cache[tkey] = D0.node_tables(
                    self._ms32, self._host_stage0, w_, s_, rounding=rounding
                )
            t = self._tab_cache[tkey]
            if origins is not None and origins[i] != (0, 0):
                t = D0.shift_tables(t, origins[i][0], origins[i][1], s_)
            tabs.append(t)
        tabs_dev = tuple(
            {k: jnp.asarray(v) for k, v in t.items()} for t in tabs
        )
        if use_pallas:
            tabs_dev = D0.mixed_tables(tabs, scales, self.params.node_n)
        # small-grid scales run the static-slice filter: their HOST node
        # tables are closed over by the fused program (never traced) so
        # every crop is a fusable lax.slice instead of a ~4 us
        # unfusable dynamic_slice kernel (ops/dense0.py)
        static_on = (
            use_pallas
            and os.environ.get("JDA_TPU_DENSE_STATIC", "1") != "0"
        )
        static_tabs = (
            tuple(
                t
                if (static_on and ny_ * nx_ <= D0.STATIC_MAX_WINDOWS)
                else None
                for t, (_, _, ny_, nx_) in zip(tabs, scales)
            )
            if use_pallas
            else None
        )
        # budgets self-tune upward on overflow (the program returns
        # true per-compaction counts)
        mxu_tail = self._mxu_tail_enabled()
        if origins is not None:
            mxu_tail = True  # banded scans require the grouped program
            # ... but not necessarily the MXU canvas tail: fn2's gather
            # groups handle band origins too (xywin is already in canvas
            # coords; origins only localize the dims mask), and the VGA
            # A/B showed the gather tail 1.7x faster at small survivor
            # populations.  JDA_TPU_BUCKETS=none routes every scale to
            # the gather tail; "default" keeps the canvas buckets.
            if os.environ.get("JDA_TPU_BUCKETS", "none") == "none":
                groups = F.group_scales(tuple(scales), buckets=())
            else:
                groups = F.group_scales(tuple(scales))
        else:
            groups = F.group_scales(tuple(scales)) if mxu_tail else None
        budgets = (
            F.default_budgets2(tuple(scales), groups, B, self.T)
            if mxu_tail
            else F.default_budgets(len(x), B, self.T, self.K)
        )
        stored = self._budget_load(key, len(budgets))
        trimmed = stored is not None
        if trimmed:
            budgets = stored
        plan = {
            "x": x,
            "y": y,
            "win": win,
            "scales": tuple(scales),
            "xywin": jnp.asarray(
                np.stack([x, y, win], axis=1).astype(np.int32)
            )
            if len(x)
            else None,
            "tabs": tabs_dev,
            "static_tabs": static_tabs,
            "budgets": budgets,
            "bkey": self._budget_key(key),
            "trimmed": trimmed,
            "groups": groups,
            "use_pallas": use_pallas,
            "rounding": rounding,
            "origins": tuple(origins) if origins is not None else None,
            "fn": None,
            "n": len(x),
            "Hc": Hc,
            "Wc": Wc,
        }
        self._fused_cache[key] = plan
        return plan

    def _fused_compile(self, plan: dict) -> dict:
        if plan["fn"] is None and plan["n"] > 0:
            if plan.get("groups") is not None:
                plan["fn"] = F.make_fused_fn2(
                    meta=plan["scales"],
                    depth=self.depth,
                    leaf_n=self.leaf_n,
                    T=self.T,
                    H=plan["Hc"],
                    W=plan["Wc"],
                    groups=plan["groups"],
                    budgets=plan["budgets"],
                    use_pallas=plan["use_pallas"],
                    rounding=plan["rounding"],
                    origins=plan.get("origins"),
                    canvas_mode=self._canvas_mode(),
                    static_tabs=plan.get("static_tabs"),
                    s0_lbf=self._s0_lbf_enabled(),
                )
            else:
                plan["fn"] = F.make_fused_fn(
                    meta=plan["scales"],
                    depth=self.depth,
                    leaf_n=self.leaf_n,
                    T=self.T,
                    H=plan["Hc"],
                    W=plan["Wc"],
                    budgets=plan["budgets"],
                    use_pallas=plan["use_pallas"],
                    rounding=plan["rounding"],
                    static_tabs=plan.get("static_tabs"),
                    s0_lbf=self._s0_lbf_enabled(),
                )
        return plan

    def _fused_run(self, plan, imgs_u8: np.ndarray, dims: np.ndarray, mesh=None):
        """Run the fused program; double any overflowed budget and retry."""
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P_

            axis = mesh.axis_names[0]
            nd = mesh.devices.size
            bpad = (-imgs_u8.shape[0]) % nd
            if bpad:
                imgs_u8 = np.concatenate(
                    [imgs_u8, np.zeros((bpad,) + imgs_u8.shape[1:], np.uint8)]
                )
                dims = np.concatenate([dims, np.zeros((bpad, 2), np.int32)])
            imgs_dev = jax.device_put(
                jnp.asarray(imgs_u8), NamedSharding(mesh, P_(axis))
            )
        else:
            imgs_dev = jnp.asarray(imgs_u8)
        dims_dev = jnp.asarray(dims.astype(np.int32))
        while True:
            out = plan["fn"](
                self.dev, imgs_dev, dims_dev, plan["tabs"], plan["xywin"]
            )
            counts = np.asarray(out["counts"])
            budgets = plan["budgets"]
            if all(int(counts[i]) <= budgets[i] for i in range(len(counts))):
                return out
            plan["budgets"] = _grown_budgets(budgets, counts)
            plan["fn"] = None
            self._budget_save(plan)
            self._fused_compile(plan)

    # -- core batched evaluation ------------------------------------------

    def _run_batch(
        self,
        flat_img: jnp.ndarray,
        geom: Dict[str, np.ndarray],
        valid_n: int,
        rounding: bool = False,
        dense_result: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
        with_stp: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Run all stages on one geometry batch, compacting between stages.

        Returns host arrays: score [valid_n], alive [valid_n], shape
        [valid_n, 2L], nvis [valid_n] (indexed in original window order).
        """
        n_total = geom["base"].shape[0]
        L2 = self.params.landmark_dim

        # results in original order
        out_score = np.full(n_total, -np.inf, np.float32)
        out_alive = np.zeros(n_total, bool)
        out_shape = np.zeros((n_total, L2), np.float32)
        out_nvis = np.zeros(n_total, np.int32)

        if valid_n == 0:
            return {
                "score": out_score,
                "alive": out_alive,
                "shape": out_shape,
                "nvis": out_nvis,
            }

        # live index set (into original window order)
        live_idx = np.arange(valid_n, dtype=np.int64)
        state_h = None  # host-side live state between stages

        # phase 1: reject the bulk of windows cheaply.
        # Preferred: the dense full-stage-0 filter (ops/dense0.py); fallback:
        # gather-path prefilter over the first prefilter_carts carts.
        if dense_result is not None:
            score_d, alive_d, nvis_d = dense_result
            out_score[:valid_n] = score_d[:valid_n]
            out_nvis[:valid_n] = nvis_d[:valid_n]
            out_shape[:valid_n] = np.asarray(self.dev["mean_shape"], np.float32)[
                None, :
            ]
            live_idx = live_idx[alive_d[:valid_n]]
        elif self.pre_chunk is not None and self.prefilter_carts < self.K:
            ms_host = np.asarray(self.dev["mean_shape"], np.float32)
            keep_parts = []
            for s0 in range(0, valid_n, self.SLAB):
                s1 = min(s0 + self.SLAB, valid_n)
                m = s1 - s0
                b = min(_bucket(m), self.SLAB)
                pad = b - m

                def padg(a, fill=0):
                    a = a[s0:s1]
                    if pad:
                        a = np.concatenate(
                            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)]
                        )
                    return jnp.asarray(a)

                state = C.init_state(
                    b,
                    self.dev["mean_shape"],
                    padg(geom["base"]),
                    padg(geom["stride"], 1),
                    padg(geom["pw"], 1),
                    padg(geom["ph"], 1),
                    jnp.asarray(
                        np.concatenate([np.ones(m, bool), np.zeros(pad, bool)])
                    ),
                )
                state, _ = self._stage_jit(
                    self.pre_chunk,
                    flat_img,
                    state,
                    depth=self.depth,
                    rounding=rounding,
                    single_scale=self.single_scale,
                )
                alive = np.asarray(state["alive"])[:m]
                out_score[s0:s1] = np.asarray(state["score"])[:m]
                out_nvis[s0:s1] = np.asarray(state["nvis"])[:m]
                out_shape[s0:s1] = ms_host[None, :]
                keep_parts.append(alive)
            live_idx = live_idx[np.concatenate(keep_parts)]

        for t in range(self.T):
            m = len(live_idx)
            if m == 0:
                break
            b = _bucket(m)
            pad = b - m

            def padgeom(a, fill=0):
                a = a[live_idx]
                if pad:
                    a = np.concatenate([a, np.full((pad,) + a.shape[1:], fill, a.dtype)])
                return jnp.asarray(a)

            base = padgeom(geom["base"])
            stride = padgeom(geom["stride"], 1)
            pw = padgeom(geom["pw"], 1)
            ph = padgeom(geom["ph"], 1)
            valid = jnp.asarray(
                np.concatenate([np.ones(m, bool), np.zeros(pad, bool)])
            )

            if t == 0:
                state = C.init_state(
                    b, self.dev["mean_shape"], base, stride, pw, ph, valid
                )
            else:
                def padf(a, fill=0.0):
                    if pad:
                        a = np.concatenate(
                            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)]
                        )
                    return jnp.asarray(a)

                state = {
                    "shape": padf(state_h["shape"]),
                    "score": padf(state_h["score"]),
                    "alive": valid,
                    "nvis": padf(state_h["nvis"]),
                    "base": base,
                    "stride": stride,
                    "pw": pw,
                    "ph": ph,
                }

            # per-stage similarity transform from the stage-entry shapes
            # (Validate recomputes it each stage, cascador.cpp:180; shared
            # by every cart chunk of the stage and by the delta)
            stp = (
                C.st_calc_dev(state["shape"], self.dev["mean_shape"])
                if with_stp
                else None
            )
            leaves_parts = []
            for chunk in self.stage_chunks[t]:
                state, lv = self._stage_jit(
                    chunk,
                    flat_img,
                    state,
                    depth=self.depth,
                    rounding=rounding,
                    single_scale=self.single_scale,
                    stp=stp,
                )
                leaves_parts.append(lv)
            leaves = (
                leaves_parts[0]
                if len(leaves_parts) == 1
                else jnp.concatenate(leaves_parts, axis=1)
            )
            state = self._regress_jit(
                self.dev["W"][t], leaves, state, leaf_n=self.leaf_n, stp=stp
            )

            alive = np.asarray(state["alive"])[:m]
            score = np.asarray(state["score"])[:m]
            shape = np.asarray(state["shape"])[:m]
            nvis = np.asarray(state["nvis"])[:m]

            # record rejected lanes' final values; keep survivors live
            out_score[live_idx] = score
            out_shape[live_idx] = shape
            out_nvis[live_idx] = nvis
            keep = alive
            out_alive[live_idx] = keep

            live_idx = live_idx[keep]
            state_h = {
                "shape": shape[keep],
                "score": score[keep],
                "nvis": nvis[keep],
            }

        return {
            "score": out_score,
            "alive": out_alive,
            "shape": out_shape,
            "nvis": out_nvis,
        }

    # -- public API --------------------------------------------------------

    def detect(
        self,
        gray: np.ndarray,
        scale: float = 1.25,
        step: float = 0.1,
        min_size: int = 24,
        max_size: int = -1,
        th: Optional[float] = None,
        nms_overlap: float = 0.3,
        batch: int = 1 << 20,
    ) -> DetectionResult:
        """jdaDetect-compatible detection (c/jda.c:443-480)."""
        assert gray.dtype == np.uint8 and gray.ndim == 2
        if th is None:
            th = self.final_th_default
        if self._fused_enabled():
            return self.detect_batch(
                [gray],
                scale=scale,
                min_size=min_size,
                max_size=max_size,
                th=th,
                nms_overlap=nms_overlap,
            )[0]
        img_h, img_w = gray.shape
        if self.single_scale:
            # single-scale models never read the half/quarter levels
            o, h, q = gray, np.zeros((1, 1), np.uint8), np.zeros((1, 1), np.uint8)
        else:
            o, h, q = R.pyramid_c(gray)
        flat, offsets, strides = R.stack_pyramid((o, h, q))
        # int32 pixels: TPU gathers from a uint8 source hit a scalar fallback
        # (~600x slower measured); the pyramid is tiny so widening is free
        flat_dev = jnp.asarray(flat.astype(np.int32))

        min_size = max(min_size, 24)
        if max_size <= 0:
            max_size = min(img_w, img_h)
        max_size = min(max_size, img_w, img_h)

        x, y, win, scales = enumerate_windows(img_w, img_h, scale, min_size, max_size)
        n = len(x)
        L2 = self.params.landmark_dim
        if n == 0:
            return DetectionResult(
                0,
                self.params.landmark_n,
                np.zeros((0, 3), np.int32),
                np.zeros((0, L2), np.float32),
                np.zeros((0,), np.float32),
            )

        # dense stage-0 filter applies on the truncation-semantics path of
        # single-scale models (shape == mean shape for every stage-0 window)
        dense = (
            self._dense_filter(gray, scales)
            if (self.single_scale and self.T > 0)
            else None
        )

        scores = np.zeros(n, np.float32)
        alive = np.zeros(n, bool)
        shapes = np.zeros((n, L2), np.float32)
        if dense is not None:
            # fast path: stage-0 dead windows are done; run every survivor
            # through the full cascade in ONE device dispatch (cascade_full)
            score_d, alive_d, _ = dense
            scores[:] = score_d
            shapes[:] = np.asarray(self.dev["mean_shape"], np.float32)[None, :]
            surv = np.flatnonzero(alive_d)
            geom = window_geometry(x[surv], y[surv], win[surv], offsets, strides)
            for s0 in range(0, len(surv), self.SLAB):
                idxs = surv[s0 : s0 + self.SLAB]
                m = len(idxs)
                b = min(_bucket(m), self.SLAB)
                pad = b - m

                def padg(a, fill=0):
                    a = a[s0 : s0 + m]
                    if pad:
                        a = np.concatenate(
                            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)]
                        )
                    return jnp.asarray(a)
                state = C.init_state(
                    b,
                    self.dev["mean_shape"],
                    padg(geom["base"]),
                    padg(geom["stride"], 1),
                    padg(geom["pw"], 1),
                    padg(geom["ph"], 1),
                    jnp.asarray(
                        np.concatenate([np.ones(m, bool), np.zeros(pad, bool)])
                    ),
                )
                out = C.cascade_full(
                    self.dev,
                    flat_dev,
                    state,
                    depth=self.depth,
                    rounding=self.rounding,
                    leaf_n=self.leaf_n,
                    T=self.T,
                    exact=True,
                    single_scale=True,
                )
                scores[idxs] = np.asarray(out["score"])[:m]
                alive[idxs] = np.asarray(out["alive"])[:m]
                shapes[idxs] = np.asarray(out["shape"])[:m]
        else:
            for s0 in range(0, n, batch):
                s1 = min(s0 + batch, n)
                geom = window_geometry(
                    x[s0:s1], y[s0:s1], win[s0:s1], offsets, strides
                )
                res = self._run_batch(
                    flat_dev, geom, s1 - s0, rounding=self.rounding
                )
                scores[s0:s1] = res["score"]
                alive[s0:s1] = res["alive"]
                shapes[s0:s1] = res["shape"]

        keep = alive & (scores >= th)  # final threshold (c/jda.c:413-414)
        cand = np.flatnonzero(keep)
        bboxes = np.stack([x[cand], y[cand], win[cand]], axis=1).astype(np.int32)
        cscores = scores[cand]
        cshapes = shapes[cand]

        picked = NMS.nms_c(bboxes, cscores, nms_overlap)
        bboxes = bboxes[picked]
        cscores = cscores[picked]
        cshapes = cshapes[picked]

        # landmark relocation (c/jda.c:465-474)
        sz = bboxes[:, 2:3].astype(np.float32)
        ox = bboxes[:, 0:1].astype(np.float32)
        oy = bboxes[:, 1:2].astype(np.float32)
        out = cshapes.copy()
        out[:, 0::2] = out[:, 0::2] * sz + ox
        out[:, 1::2] = out[:, 1::2] * sz + oy

        return DetectionResult(
            len(picked), self.params.landmark_n, bboxes, out, cscores
        )


    # -- batched multi-image detection ---------------------------------------

    def detect_batch(
        self,
        grays: List[np.ndarray],
        scale: float = 1.25,
        min_size: int = 24,
        max_size: int = -1,
        th: Optional[float] = None,
        nms_overlap: float = 0.3,
        mesh=None,
    ) -> List[DetectionResult]:
        """jdaDetect over a batch of images in ONE fused device dispatch.

        Images are placed top-left in canonical (max-dims) planes; windows
        are enumerated once on the canonical grid with per-image validity
        masks, and the whole cascade (dense stage-0 filter, survivor
        compaction, tail stages with per-stage compaction) runs as a single
        jit program (ops/fused.py).  Per-image results are identical to the
        unfused path for single-scale models (windows never read outside
        their own image at the origin level); multi-scale models fall back
        to per-image detection.
        """
        if th is None:
            th = self.final_th_default
        if not self._fused_enabled():
            return [
                self.detect(
                    g,
                    scale=scale,
                    min_size=min_size,
                    max_size=max_size,
                    th=th,
                    nms_overlap=nms_overlap,
                )
                for g in grays
            ]

        B = len(grays)
        Hc = max(g.shape[0] for g in grays)
        Wc = max(g.shape[1] for g in grays)
        L2 = self.params.landmark_dim
        min_size = max(min_size, 24)
        ms_c = max_size if max_size > 0 else min(Wc, Hc)
        ms_c = min(ms_c, Wc, Hc)

        plan = self._fused_plan(B, Hc, Wc, scale, min_size, ms_c)
        if plan["n"] == 0:
            return [
                DetectionResult(
                    0,
                    self.params.landmark_n,
                    np.zeros((0, 3), np.int32),
                    np.zeros((0, L2), np.float32),
                    np.zeros((0,), np.float32),
                )
                for _ in grays
            ]

        # single-scale models read only the origin level, so the "pyramid"
        # is one uint8 plane per image, uploaded once and widened on device
        imgs_u8 = np.zeros((B, Hc, Wc), np.uint8)
        for i, g in enumerate(grays):
            imgs_u8[i, : g.shape[0], : g.shape[1]] = g
        dims = np.array([[g.shape[1], g.shape[0]] for g in grays], np.int32)

        out = self._fused_run(plan, imgs_u8, dims, mesh=mesh)
        return self._harvest_batch(plan, out, B, th, nms_overlap)

    def _harvest_batch(self, plan, out, B, th, nms_overlap):
        """Host post-pass of one fused-batch output: per-image selection,
        NMS, window-frame -> image-frame shapes."""
        sel = np.asarray(out["sel"])
        score = np.asarray(out["score"])
        shape = np.asarray(out["shape"])
        alive = np.asarray(out["alive"])
        self.last_stats = {
            "windows": int(plan["n"]) * B,
            "counts": np.asarray(out["counts"]).tolist(),
            "total_nvis": int(np.asarray(out["total_nvis"])),
        }

        n = plan["n"]
        x, y, win = plan["x"], plan["y"], plan["win"]
        keep = (sel >= 0) & alive & (score >= th)
        bi = np.where(sel >= 0, sel // n, -1)
        wi = np.where(sel >= 0, sel % n, 0)
        results = []
        for i in range(B):
            m = keep & (bi == i)
            cand = wi[m]
            bboxes = np.stack([x[cand], y[cand], win[cand]], axis=1).astype(
                np.int32
            )
            cscores = score[m]
            cshapes = shape[m]
            picked = NMS.nms_c(bboxes, cscores, nms_overlap)
            bboxes = bboxes[picked]
            cscores = cscores[picked]
            cshapes = cshapes[picked]
            sz = bboxes[:, 2:3].astype(np.float32)
            outs = cshapes.copy()
            outs[:, 0::2] = outs[:, 0::2] * sz + bboxes[:, 0:1]
            outs[:, 1::2] = outs[:, 1::2] * sz + bboxes[:, 1:2]
            results.append(
                DetectionResult(
                    len(picked),
                    self.params.landmark_n,
                    bboxes,
                    outs,
                    cscores,
                )
            )
        return results

    def detect_stream(
        self,
        grays: List[np.ndarray],
        batch: int = 8,
        scale: float = 1.25,
        min_size: int = 24,
        max_size: int = -1,
        th: Optional[float] = None,
        nms_overlap: float = 0.3,
    ) -> List[DetectionResult]:
        """Throughput-mode detection over many images: chunks of `batch`
        share one compiled plan and run through a 1-deep pipeline — chunk
        i's upload/dispatch overlaps chunk i-1's download/NMS, so the
        host<->device link and the chip work concurrently (the production
        serving shape; the reference's analog is its OpenMP fold loop,
        src/test.cpp:100-101).  Results identical to detect_batch."""
        if th is None:
            th = self.final_th_default
        if not self._fused_enabled() or len(grays) == 0:
            return self.detect_batch(
                grays, scale=scale, min_size=min_size, max_size=max_size,
                th=th, nms_overlap=nms_overlap,
            )
        B = batch
        Hc = max(g.shape[0] for g in grays)
        Wc = max(g.shape[1] for g in grays)
        min_size = max(min_size, 24)
        ms_c = max_size if max_size > 0 else min(Wc, Hc)
        ms_c = min(ms_c, Wc, Hc)
        plan = self._fused_plan(B, Hc, Wc, scale, min_size, ms_c)
        if plan["n"] == 0:
            return self.detect_batch(grays, scale=scale, min_size=min_size,
                                     max_size=max_size, th=th,
                                     nms_overlap=nms_overlap)

        results: List[DetectionResult] = []
        pending = None  # (out handles, n_valid)

        def dispatch(chunk):
            imgs_u8 = np.zeros((B, Hc, Wc), np.uint8)
            dims = np.zeros((B, 2), np.int32)
            for i, g in enumerate(chunk):
                imgs_u8[i, : g.shape[0], : g.shape[1]] = g
                dims[i] = (g.shape[1], g.shape[0])
            out = plan["fn"](
                self.dev,
                jnp.asarray(imgs_u8),
                jnp.asarray(dims),
                plan["tabs"],
                plan["xywin"],
            )
            return (out, len(chunk))

        def grow_budgets(out):
            counts = np.asarray(out["counts"])
            plan["budgets"] = _grown_budgets(plan["budgets"], counts)
            plan["fn"] = None
            self._budget_save(plan)
            self._fused_compile(plan)

        hwm = [0] * len(plan["budgets"])  # observed survivor high-water mark

        def harvest(entry):
            out, nv = entry
            counts = np.asarray(out["counts"])
            if any(
                int(counts[i]) > plan["budgets"][i]
                for i in range(len(counts))
            ):
                return False  # overflow: caller re-runs this chunk
            for i in range(len(hwm)):
                hwm[i] = max(hwm[i], int(counts[i]))
            results.extend(
                self._harvest_batch(plan, out, B, th, nms_overlap)[:nv]
            )
            return True

        chunks = [grays[i : i + B] for i in range(0, len(grays), B)]
        ci = 0
        while ci < len(chunks):
            entry = dispatch(chunks[ci])
            if pending is not None and not harvest(pending):
                # budget overflow in the in-flight chunk (ci-1): grow,
                # recompile, and replay it (the current dispatch used the
                # stale budgets too, so it is dropped and redone)
                grow_budgets(pending[0])
                pending = None
                ci -= 1
                continue
            pending = entry
            ci += 1
        while pending is not None:
            if harvest(pending):
                pending = None
            else:
                grow_budgets(pending[0])
                pending = dispatch(chunks[-1])
        if plan["n"] * B > 4096:  # small problems keep full-capacity lanes
            self._maybe_trim_budgets(plan, hwm, chunks[-1], dispatch)
        return results

    def _maybe_trim_budgets(self, plan, hwm, sample_chunk, dispatch):
        """Shrink-to-fit the survivor lane budgets after a stream pass.

        default_budgets sizes lanes for a worst-case trained cascade
        (~2.5x slack measured on the VGA bench: 6656 budgeted vs ~2600
        alive at the stage-0 compaction), and every padded lane pays full
        gather+tree+regression cost in the survivor tail.  Once a stream
        has observed real survivor populations, re-size each lane to
        hwm * 11/8 (256-rounded) and recompile — the overflow path
        (grow_budgets) still protects later, busier, inputs.  One warm
        dispatch absorbs the XLA compile so the next stream runs trimmed
        at full speed.  Opt out with JDA_TPU_BUDGET_TRIM=0."""
        import os

        if (
            plan.get("trimmed")
            or os.environ.get("JDA_TPU_BUDGET_TRIM", "1") == "0"
            or not any(hwm)
        ):
            return
        plan["trimmed"] = True
        trimmed = tuple(
            max(256, (h * 11 // 8 + 255) // 256 * 256)
            for h in hwm
        )
        if all(t >= b for t, b in zip(trimmed, plan["budgets"])):
            return
        plan["budgets"] = tuple(
            min(t, b) for t, b in zip(trimmed, plan["budgets"])
        )
        plan["fn"] = None
        self._budget_save(plan)
        self._fused_compile(plan)
        out, _ = dispatch(sample_chunk)  # absorb the compile now
        np.asarray(out["counts"])


def detect(params: CascadeParams, gray: np.ndarray, **kw) -> DetectionResult:
    """One-shot functional API."""
    return Detector(params).detect(gray, **kw)
