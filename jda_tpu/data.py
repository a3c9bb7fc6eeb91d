"""Training data layer: corpus, similarity transform, hard-negative stream.

TPU-first redesign of the reference's DataSet/NegGenerator
(/root/reference/include/jda/data.hpp, src/jda/data.cpp):

  * the corpus is a structure-of-arrays — every sample's o/h/q patches are
    one flat row of a [N, D] uint8 matrix (D = so^2+sh^2+sq^2), so the whole
    corpus ships to the device as a single int32 buffer addressable by the
    detection kernels' (base, stride, pw, ph) scheme (train/features.py);
  * samples are NOT physically reordered: the reference quicksorts the
    whole corpus by score to pick thresholds (data.cpp:380-410); here
    thresholds come from np.partition and removal is a boolean mask —
    numerically identical, batch-friendly;
  * all randomness is an explicit np.random.Generator (the reference seeds
    cv::RNGs from the tick counter, common.cpp:233-238 — nondeterministic).

Binary corpus snapshots are bit-compatible with writeDataSet/readDataSet
(data.cpp:698-834), so a training run can resume from (or hand its corpus
to) the reference implementation.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from jda_tpu.config import Config


# ---------------------------------------------------------------------------
# Device-mirror helpers (uint8 on the wire; widen/update/compact on device)
#
# The relay tunnel to the chip moves ~3-30 MB/s, so corpus maintenance must
# never re-ship the corpus: rows ship once as uint8 and all bookkeeping
# (int32 widening, mined-row appends, dead-row compaction) runs on device.
# ---------------------------------------------------------------------------

def _pow2(n: int, lo: int = 64) -> int:
    cap = lo
    while cap < n:
        cap *= 2
    return cap


def _dev_fns():
    """Lazy jitted mirror ops (import jax only when a mirror is built)."""
    global _DEV
    if _DEV is None:
        import functools

        import jax
        import jax.numpy as jnp

        def widen_flat(rows_u8):  # [cap, D] u8 -> [cap*D] i32
            return rows_u8.astype(jnp.int32).reshape(-1)

        def to_canvas(orows_u8, S):  # [cap, S*S] u8 -> [cap, S, S] i8
            return (
                (orows_u8.astype(jnp.int16) - 128)
                .astype(jnp.int8)
                .reshape(-1, S, S)
            )

        def append_flat(flat, rows_u8, n0):  # in-place mined-row append
            D = rows_u8.shape[1]
            return jax.lax.dynamic_update_slice(
                flat, rows_u8.astype(jnp.int32).reshape(-1), (n0 * D,)
            )

        def append_canvas(canvas, orows_u8, n0):
            S = canvas.shape[1]
            patch = to_canvas(orows_u8, S)
            return jax.lax.dynamic_update_slice(canvas, patch, (n0, 0, 0))

        def compact_flat(flat, idxp):  # row-gather the survivors
            cap = idxp.shape[0]
            D = flat.shape[0] // cap
            return jnp.take(flat.reshape(cap, D), idxp, axis=0).reshape(-1)

        def compact_canvas(canvas, idxp):
            return jnp.take(canvas, idxp, axis=0)

        def grow_flat(flat, newlen):
            return jnp.concatenate(
                [flat, jnp.zeros(newlen - flat.shape[0], jnp.int32)]
            )

        def grow_canvas(canvas, newcap):
            S = canvas.shape[1]
            pad = jnp.zeros((newcap - canvas.shape[0], S, S), jnp.int8)
            return jnp.concatenate([canvas, pad])

        def append_rows(buf, rows, n0):  # generic [cap, ...] f32 mirror
            start = (n0,) + (0,) * (buf.ndim - 1)
            return jax.lax.dynamic_update_slice(buf, rows, start)

        def grow_rows(buf, newcap):
            pad = jnp.zeros(
                (newcap - buf.shape[0],) + buf.shape[1:], buf.dtype
            )
            return jnp.concatenate([buf, pad])

        _DEV = dict(
            widen_flat=jax.jit(widen_flat),
            to_canvas=jax.jit(to_canvas, static_argnames=("S",)),
            append_flat=jax.jit(append_flat, donate_argnums=(0,)),
            append_canvas=jax.jit(append_canvas, donate_argnums=(0,)),
            compact_flat=jax.jit(compact_flat),
            compact_canvas=jax.jit(compact_canvas),
            grow_flat=jax.jit(grow_flat, static_argnames=("newlen",)),
            grow_canvas=jax.jit(grow_canvas, static_argnames=("newcap",)),
            append_rows=jax.jit(append_rows, donate_argnums=(0,)),
            compact_rows=jax.jit(compact_canvas),  # same row-gather
            grow_rows=jax.jit(grow_rows, static_argnames=("newcap",)),
        )
    return _DEV


_DEV = None


# ---------------------------------------------------------------------------
# Similarity transform (STParameter, data.cpp:64-126)
# ---------------------------------------------------------------------------

def st_identity(n: int) -> np.ndarray:
    m = np.zeros((n, 2, 2))
    m[:, 0, 0] = m[:, 1, 1] = 1.0
    return m


def st_calc(shape1: np.ndarray, shape2: np.ndarray, enabled: bool) -> np.ndarray:
    """Batched STParameter::Calc: scale*rot matrices [N, 2, 2] mapping
    frame 2 -> frame 1 offsets (data.cpp:64-114).  Identity when the
    config disables similarity transforms (both shipped configs do)."""
    n = shape1.shape[0]
    if not enabled:
        return st_identity(n)
    x1 = shape1[:, 0::2]
    y1 = shape1[:, 1::2]
    x2 = shape2[:, 0::2]
    y2 = shape2[:, 1::2]
    cx1 = x1.mean(1, keepdims=True)
    cy1 = y1.mean(1, keepdims=True)
    cx2 = x2.mean(1, keepdims=True)
    cy2 = y2.mean(1, keepdims=True)
    tx1, ty1 = x1 - cx1, y1 - cy1
    tx2, ty2 = x2 - cx2, y2 - cy2
    s1 = np.sqrt((tx1**2 + ty1**2).sum(1))
    s2 = np.sqrt((tx2**2 + ty2**2).sum(1))
    scale = s1 / s2
    tx1n, ty1n = tx1 / s1[:, None], ty1 / s1[:, None]
    tx2n, ty2n = tx2 / s2[:, None], ty2 / s2[:, None]
    num = (ty1n * tx2n - tx1n * ty2n).sum(1)
    den = (tx1n * tx2n + ty1n * ty2n).sum(1)
    norm = np.sqrt(num**2 + den**2)
    sin_t = num / norm
    cos_t = den / norm
    m = np.zeros((n, 2, 2))
    m[:, 0, 0] = scale * cos_t
    m[:, 0, 1] = scale * -sin_t
    m[:, 1, 0] = scale * sin_t
    m[:, 1, 1] = scale * cos_t
    return m


def st_apply(m: np.ndarray, shapes: np.ndarray) -> np.ndarray:
    """Apply [N, 2, 2] transforms to [N, 2L] interleaved xy shapes."""
    n, L2 = shapes.shape
    xy = shapes.reshape(n, L2 // 2, 2)
    out = np.einsum("nij,nlj->nli", m, xy)
    return out.reshape(n, L2)


# ---------------------------------------------------------------------------
# Image helpers
# ---------------------------------------------------------------------------

def get_face(img: np.ndarray, x: int, y: int, w: int, h: int) -> np.ndarray:
    """Crop a bbox, black-filling out-of-range regions (data.cpp:542-565)."""
    rows, cols = img.shape
    if x >= 0 and y >= 0 and x + w < cols and y + h < rows:
        return img[y : y + h, x : x + w].copy()
    big = np.zeros((3 * rows, 3 * cols), np.uint8)
    big[rows : 2 * rows, cols : 2 * cols] = img
    return big[y + rows : y + rows + h, x + cols : x + cols + w].copy()


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    import cv2

    return cv2.resize(img, (size, size))  # INTER_LINEAR, as the reference


def patch_row(face: np.ndarray, c: Config) -> np.ndarray:
    """One corpus row: o/h/q patches resized and concatenated flat."""
    return np.concatenate(
        [
            _resize(face, c.img_o_size).reshape(-1),
            _resize(face, c.img_h_size).reshape(-1),
            _resize(face, c.img_q_size).reshape(-1),
        ]
    )


# ---------------------------------------------------------------------------
# DataSet
# ---------------------------------------------------------------------------

class DataSet:
    """Training corpus (positives or negatives), SoA host-side with a lazy
    device mirror of the flat patch buffer."""

    def __init__(self, c: Config, is_pos: bool):
        self.c = c
        self.is_pos = is_pos
        self.dims = (c.img_o_size, c.img_h_size, c.img_q_size)
        self.D = sum(d * d for d in self.dims)
        L2 = c.landmark_dim
        self.imgs = np.zeros((0, self.D), np.uint8)
        self.gt_shapes = np.zeros((0, L2))
        self.shape_mask = np.zeros(0, np.int32)
        self.current_shapes = np.zeros((0, L2))
        self.scores = np.zeros(0)
        self.last_scores = np.zeros(0)
        self.weights = np.zeros(0)
        self.stp_mc = np.zeros((0, 2, 2))
        self.stp_cm = np.zeros((0, 2, 2))
        self.mean_shape: Optional[np.ndarray] = None
        self.live = np.zeros(0, bool)
        self._flat_dev = None
        self._flat_cap = -1
        self._canvas_dev = None
        self._canvas_cap = -1
        self._shapes_dev = None  # [cap, 2L] f32 current_shapes mirror
        self._shapes_cap = -1
        self._stp_dev = None  # [cap, 2, 2] f32 stp_mc mirror (ST configs)
        self._stp_cap = -1
        self.device_sharding = None  # set by a mesh-bound Trainer
        # capacity floor for the device mirrors: a resumed corpus can be
        # small (a stage-end snapshot after removals), and compiling the
        # fused trainer at a never-seen tiny capacity both misses the
        # compile cache and has hit TPU-compiler crashes; reserve() pins
        # the mirrors at the capacities the original run already compiled
        self._min_cap = 0

    @property
    def size(self) -> int:
        """Count of live samples (dead rows await lazy compaction)."""
        return int(self.live.sum())

    def live_idx(self) -> np.ndarray:
        return np.flatnonzero(self.live)

    # -- device mirror ------------------------------------------------------

    def invalidate(self):
        self._flat_dev = None
        self._canvas_dev = None
        self.invalidate_shapes()

    def _mirror_cap(self) -> int:
        """Unified row capacity for ALL device mirrors of this corpus.
        The fused cart trainer feeds several mirrors into one jit, so
        their leading dimensions must agree even when one was (re)built
        after another grew."""
        return max(
            _pow2(len(self.imgs)),
            self._min_cap,
            self._flat_cap,
            self._canvas_cap,
            self._shapes_cap,
            self._stp_cap,
        )

    def reserve(self, n: int) -> None:
        """Pin the device-mirror capacity at >= _pow2(n) rows (see
        _min_cap).  Call before first device use after a snapshot resume."""
        self._min_cap = max(self._min_cap, _pow2(max(n, 1)))

    def invalidate_shapes(self):
        """Drop the per-sample shape-state mirrors.  Must be called after
        any host mutation of current_shapes/stp_mc that is not an append
        or a compaction (global regression, snapshot load)."""
        self._shapes_dev = None
        self._stp_dev = None

    def shapes_dev(self):
        """[cap, 2L] f32 device mirror of current_shapes, maintained
        through appends/compactions like the pixel mirrors.  Within a
        stage the positives' shapes never change and the negatives' only
        grow, so the fused cart trainer reads them without re-upload."""
        import jax.numpy as jnp

        cap = self._mirror_cap()
        if self._shapes_dev is None or self._shapes_cap < cap:
            buf = np.zeros((cap, self.c.landmark_dim), np.float32)
            buf[: len(self.imgs)] = self.current_shapes
            self._shapes_dev = jnp.asarray(buf)
            self._shapes_cap = cap
        return self._shapes_dev

    def stp_dev(self):
        """[cap, 2, 2] f32 device mirror of stp_mc (None when similarity
        transforms are disabled — the shipped configs)."""
        import jax.numpy as jnp

        if not self.c.with_similarity_transform:
            return None
        cap = self._mirror_cap()
        if self._stp_dev is None or self._stp_cap < cap:
            buf = np.zeros((cap, 2, 2), np.float32)
            buf[: len(self.imgs)] = self.stp_mc
            self._stp_dev = jnp.asarray(buf)
            self._stp_cap = cap
        return self._stp_dev

    def canvas_dev(self):
        """Device mirror of the ORIGIN-scale patches as [cap, S, S] int8
        (pixel - 128) for the gather-free MXU feature extractor
        (train/features.py feature_values_mxu); the -128 shift cancels in
        the pixel difference, so values are bit-identical to flat_dev
        gathers.  Same power-of-two row-capacity scheme as flat_dev;
        mined-row appends and compactions maintain it ON DEVICE
        (_dev_append/_dev_compact) — no corpus re-upload."""
        import jax.numpy as jnp

        cap = self._mirror_cap()
        if self._canvas_dev is None or self._canvas_cap < cap:
            S = self.dims[0]
            buf = np.zeros((cap, S * S), np.uint8)
            buf[: len(self.imgs)] = self.imgs[:, : S * S]
            arr = _dev_fns()["to_canvas"](jnp.asarray(buf), S=S)
            if getattr(self, "device_sharding", None) is not None:
                import jax

                arr = jax.device_put(arr, self.device_sharding)
            self._canvas_dev = arr
            self._canvas_cap = cap
        return self._canvas_dev

    def flat_dev(self):
        """Device mirror of the corpus, padded to a power-of-two row
        capacity so removals don't change the compiled buffer shape.  Rows
        cross the relay as uint8 and widen to int32 on device; appends and
        compactions update the resident buffer in place."""
        import jax.numpy as jnp

        cap = self._mirror_cap()
        if self._flat_dev is None or self._flat_cap < cap:
            buf = np.zeros((cap, self.D), np.uint8)
            buf[: len(self.imgs)] = self.imgs
            arr = _dev_fns()["widen_flat"](jnp.asarray(buf))
            if getattr(self, "device_sharding", None) is not None:
                # multi-chip training: the corpus buffer is replicated so
                # every chip's feature gathers stay local (train/sharded.py)
                import jax

                arr = jax.device_put(arr, self.device_sharding)
            self._flat_dev = arr
            self._flat_cap = cap
        return self._flat_dev

    def _dev_append(
        self,
        rows_u8: np.ndarray,
        n0: int,
        shapes: Optional[np.ndarray] = None,
    ) -> None:
        """Mirror an append of `rows_u8` (and their current shapes) at
        physical row n0 onto any live device buffers (mesh-sharded mirrors
        rebuild lazily instead)."""
        if len(rows_u8) == 0:
            return
        if getattr(self, "device_sharding", None) is not None:
            self.invalidate()
            return
        import jax.numpy as jnp

        m = len(rows_u8)
        mb = _pow2(m)  # pad the upload so batch sizes share compilations
        # capacity must cover the PADDED write window: dynamic_update_slice
        # clamps an out-of-range start, which would shift the write onto
        # valid rows.  One shared capacity across mirrors (see _mirror_cap)
        need = max(_pow2(n0 + mb), self._mirror_cap())
        fns = _dev_fns()
        if self._flat_dev is not None:
            newcap = max(need, self._flat_cap)
            if newcap != self._flat_cap:
                self._flat_dev = fns["grow_flat"](
                    self._flat_dev, newlen=newcap * self.D
                )
                self._flat_cap = newcap
            pad = np.zeros((mb, self.D), np.uint8)
            pad[:m] = rows_u8
            self._flat_dev = fns["append_flat"](
                self._flat_dev, jnp.asarray(pad), n0
            )
        if self._canvas_dev is not None:
            S = self.dims[0]
            newcap = max(need, self._canvas_cap)
            if newcap != self._canvas_cap:
                self._canvas_dev = fns["grow_canvas"](
                    self._canvas_dev, newcap=newcap
                )
                self._canvas_cap = newcap
            pad = np.zeros((mb, S * S), np.uint8)
            pad[:m] = rows_u8[:, : S * S]
            self._canvas_dev = fns["append_canvas"](
                self._canvas_dev, jnp.asarray(pad), n0
            )
        if self._shapes_dev is not None and shapes is not None:
            newcap = max(need, self._shapes_cap)
            if newcap != self._shapes_cap:
                self._shapes_dev = fns["grow_rows"](
                    self._shapes_dev, newcap=newcap
                )
                self._shapes_cap = newcap
            pad = np.zeros((mb, shapes.shape[1]), np.float32)
            pad[:m] = shapes
            self._shapes_dev = fns["append_rows"](
                self._shapes_dev, jnp.asarray(pad), n0
            )
        elif shapes is None:
            self._shapes_dev = None
        # calc_st_parameters recomputes EVERY row's stp after an append, so
        # the stp mirror cannot be updated incrementally
        self._stp_dev = None

    def _dev_compact(self, keep_idx: np.ndarray) -> None:
        """Mirror a host compaction (imgs = imgs[keep_idx]) on device."""
        if getattr(self, "device_sharding", None) is not None:
            self.invalidate()
            return
        import jax.numpy as jnp

        fns = _dev_fns()
        if self._flat_dev is not None:
            idxp = np.zeros(self._flat_cap, np.int32)
            idxp[: len(keep_idx)] = keep_idx
            self._flat_dev = fns["compact_flat"](
                self._flat_dev, jnp.asarray(idxp)
            )
        if self._canvas_dev is not None:
            idxp = np.zeros(self._canvas_cap, np.int32)
            idxp[: len(keep_idx)] = keep_idx
            self._canvas_dev = fns["compact_canvas"](
                self._canvas_dev, jnp.asarray(idxp)
            )
        for attr, cap_attr in (
            ("_shapes_dev", "_shapes_cap"),
            ("_stp_dev", "_stp_cap"),
        ):
            buf = getattr(self, attr)
            if buf is not None:
                idxp = np.zeros(getattr(self, cap_attr), np.int32)
                idxp[: len(keep_idx)] = keep_idx
                setattr(
                    self, attr, fns["compact_rows"](buf, jnp.asarray(idxp))
                )

    # -- loading ------------------------------------------------------------

    def load_positive(self, face_txt: str, rng: np.random.Generator) -> None:
        """LoadPositiveDataSet (data.cpp:567-678): token-stream parse of
        `path x y w h lm1x lm1y ...`, bbox crop with black fill, landmark
        normalization to [0,1], optional flip augment with symmetric
        landmark swap, mean shape, random initial shapes."""
        import cv2

        c = self.c
        L = c.landmark_n
        with open(face_txt) as f:
            toks = f.read().split()
        stride = 5 + 2 * L
        assert len(toks) % stride == 0, "malformed face.txt"
        n = len(toks) // stride

        rows = []
        gts = []
        masks = []
        for i in range(n):
            rec = toks[i * stride : (i + 1) * stride]
            path = rec[0]
            x, y, w, h = (int(float(v)) for v in rec[1:5])
            lm = np.asarray([float(v) for v in rec[5:]], np.float64)
            mask = -1 if (lm < 0).all() else 1
            img = cv2.imread(path)
            if img is None:
                raise IOError(f"can not open {path}")
            gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            face = get_face(gray, x, y, w, h)
            lm[0::2] = (lm[0::2] - x) / w
            lm[1::2] = (lm[1::2] - y) / h
            rows.append(patch_row(face, c))
            gts.append(lm)
            masks.append(mask)
            if c.face_augment_on:
                rows.append(patch_row(face[:, ::-1], c))
                flm = lm.copy()
                flm[0::2] = 1 - flm[0::2]
                left, right = c.symmetric_landmarks
                for a, b in zip(left, right):
                    fa = flm[2 * a : 2 * a + 2].copy()
                    flm[2 * a : 2 * a + 2] = flm[2 * b : 2 * b + 2]
                    flm[2 * b : 2 * b + 2] = fa
                gts.append(flm)
                masks.append(mask)

        self.imgs = np.stack(rows).astype(np.uint8)
        self.gt_shapes = np.stack(gts)
        self.shape_mask = np.asarray(masks, np.int32)
        m = len(self.imgs)
        self.scores = np.zeros(m)
        self.last_scores = np.zeros(m)
        self.weights = np.zeros(m)
        self.stp_mc = st_identity(m)
        self.stp_cm = st_identity(m)
        self.live = np.ones(m, bool)
        self.calc_mean_shape()
        self.current_shapes = self.random_shapes(rng)
        self.invalidate()

    def calc_mean_shape(self) -> np.ndarray:
        valid = self.shape_mask == 1
        self.mean_shape = self.gt_shapes[valid].mean(0)
        return self.mean_shape

    def random_shapes(self, rng: np.random.Generator) -> np.ndarray:
        """Mean shape + per-sample global uniform shift (data.cpp:225-253)."""
        s = self.c.shift_size
        shift = rng.uniform(-s, s, (len(self.imgs), 2))
        out = np.tile(self.mean_shape, (len(self.imgs), 1))
        out[:, 0::2] += shift[:, 0:1]
        out[:, 1::2] += shift[:, 1:2]
        return out

    # -- boosting state ops (data.cpp:255-448) -------------------------------

    def update_weights_local(self):
        flag = -1.0 if self.is_pos else 1.0
        self.weights[self.live] = np.exp(flag * self.scores[self.live])

    # RealBoost weights are quantized to multiples of 2^-23 after the joint
    # normalization (sum == 1).  Every float32 sum of such values — MXU
    # histogram contractions, cumsative sums over bins, psum partials across
    # a device mesh — is then EXACT in any association order (each partial
    # sum is an integer multiple of 2^-23 below 2^24 quanta), so the split
    # search makes bit-identical decisions on one chip and on any mesh.
    # The reference's OpenMP reductions are run-to-run nondeterministic
    # (data.cpp:255-303 under omp); this is strictly stronger.
    WEIGHT_FRAC_BITS = 23

    @staticmethod
    def update_weights(pos: "DataSet", neg: "DataSet"):
        pos.update_weights_local()
        neg.update_weights_local()
        total = pos.weights[pos.live].sum() + neg.weights[neg.live].sum()
        if not np.isfinite(total) or total <= 0.0:
            # degenerate pools (exp under/overflow after one side emptied):
            # uniform weights keep the boosting state finite instead of
            # poisoning every sample with NaN
            n_live = pos.size + neg.size
            pos.weights[pos.live] = 1.0 / max(n_live, 1)
            neg.weights[neg.live] = 1.0 / max(n_live, 1)
        else:
            pos.weights[pos.live] /= total
            neg.weights[neg.live] /= total
        q = float(1 << DataSet.WEIGHT_FRAC_BITS)
        pos.weights[pos.live] = np.round(pos.weights[pos.live] * q) / q
        neg.weights[neg.live] = np.round(neg.weights[neg.live] * q) / q
        pos.weights[~pos.live] = 0.0
        neg.weights[~neg.live] = 0.0

    def calc_threshold_by_rate(self, rate: float) -> float:
        """Score at the (1-rate) quantile from the top (data.cpp:330-334)."""
        s = np.sort(self.scores[self.live])[::-1]
        off = len(s) - 1 - int(rate * len(s))
        return float(s[max(off, 0)])

    def calc_threshold_by_number(self, remove: int) -> float:
        """Score of the `remove`-th lowest sample (data.cpp:335-345)."""
        s = self.scores[self.live]
        k = min(remove, len(s) - 1)
        return float(np.partition(s, k)[k])

    def pre_remove(self, th: float) -> int:
        return int((self.scores[self.live] < th).sum())

    def remove(self, th: float) -> None:
        """Drop live samples scoring below th (data.cpp:347-378).  Rows are
        mask-killed; physical compaction happens lazily so the device
        corpus buffer keeps its shape across carts."""
        self.live &= self.scores >= th
        if len(self.imgs) and self.size < 0.5 * len(self.imgs):
            self.compact()

    def compact(self) -> None:
        keep = self.live
        keep_idx = np.flatnonzero(keep).astype(np.int32)
        self._dev_compact(keep_idx)
        self.imgs = self.imgs[keep]
        if self.is_pos:
            self.gt_shapes = self.gt_shapes[keep]
            self.shape_mask = self.shape_mask[keep]
        self.current_shapes = self.current_shapes[keep]
        self.scores = self.scores[keep]
        self.last_scores = self.last_scores[keep]
        self.weights = self.weights[keep]
        self.stp_mc = self.stp_mc[keep]
        self.stp_cm = self.stp_cm[keep]
        self.live = np.ones(len(self.imgs), bool)

    def reset_scores(self):
        self.scores = self.last_scores.copy()

    @staticmethod
    def calc_mean_std(pos: "DataSet", neg: "DataSet") -> Tuple[float, float]:
        s = np.concatenate([pos.scores[pos.live], neg.scores[neg.live]])
        return float(s.mean()), float(s.std())

    def apply_mean_std(self, mean: float, std: float):
        self.scores[self.live] = (self.scores[self.live] - mean) / std

    def calc_st_parameters(self, mean_shape: np.ndarray):
        en = self.c.with_similarity_transform
        n = len(self.imgs)
        self.stp_mc = st_calc(self.current_shapes, mean_shape[None].repeat(n, 0), en)
        self.stp_cm = st_calc(mean_shape[None].repeat(n, 0), self.current_shapes, en)

    def shape_residual(self, idx: np.ndarray, landmark_id: Optional[int] = None) -> np.ndarray:
        """gt - current in the mean-shape frame (data.cpp:175-208)."""
        res = self.gt_shapes[idx] - self.current_shapes[idx]
        if landmark_id is None:
            return st_apply(self.stp_cm[idx], res)
        r = res[:, 2 * landmark_id : 2 * landmark_id + 2]
        return np.einsum("nij,nj->ni", self.stp_cm[idx], r)

    def append_negatives(
        self,
        rows: np.ndarray,
        scores: np.ndarray,
        shapes: np.ndarray,
        mean_shape: np.ndarray,
    ) -> None:
        """MoreNegSamples tail (data.cpp:479-532): mined patches enter with
        their cascade score and partially-regressed shape."""
        assert not self.is_pos
        m = len(rows)
        self._dev_append(
            rows.astype(np.uint8),
            len(self.imgs),
            shapes=shapes.astype(np.float32),
        )
        self.imgs = np.concatenate([self.imgs, rows.astype(np.uint8)])
        self.current_shapes = np.concatenate([self.current_shapes, shapes])
        self.scores = np.concatenate([self.scores, scores])
        self.last_scores = np.concatenate([self.last_scores, np.zeros(m)])
        self.weights = np.concatenate([self.weights, np.zeros(m)])
        self.stp_mc = np.concatenate([self.stp_mc, st_identity(m)])
        self.stp_cm = np.concatenate([self.stp_cm, st_identity(m)])
        self.live = np.concatenate([self.live, np.ones(m, bool)])
        self.calc_st_parameters(mean_shape)

    # -- binary snapshot, bit-compatible with writeDataSet/readDataSet -------

    def write_to(self, fout) -> None:
        self.compact()
        c = self.c
        np.asarray([1 if self.is_pos else 0, self.size], "<i4").tofile(fout)
        if self.is_pos:
            self.mean_shape.astype("<f8").tofile(fout)
        so, sh, sq = self.dims
        for i in range(self.size):
            off = 0
            for d in (so, sh, sq):
                np.asarray([d, d], "<i4").tofile(fout)
                self.imgs[i, off : off + d * d].tofile(fout)
                off += d * d
            if self.is_pos:
                np.asarray([self.shape_mask[i]], "<i4").tofile(fout)
                self.gt_shapes[i].astype("<f8").tofile(fout)
            self.current_shapes[i].astype("<f8").tofile(fout)
            np.asarray([self.scores[i], self.weights[i]], "<f8").tofile(fout)

    def read_from(self, fin) -> None:
        c = self.c
        L2 = c.landmark_dim
        flag, n = np.fromfile(fin, "<i4", 2)
        self.is_pos = bool(flag)
        if self.is_pos:
            self.mean_shape = np.fromfile(fin, "<f8", L2)
        rows = np.zeros((n, self.D), np.uint8)
        gts = np.zeros((n, L2))
        masks = np.zeros(n, np.int32)
        curs = np.zeros((n, L2))
        scores = np.zeros(n)
        weights = np.zeros(n)
        for i in range(n):
            off = 0
            for _ in range(3):
                cols, rws = np.fromfile(fin, "<i4", 2)
                rows[i, off : off + cols * rws] = np.fromfile(
                    fin, np.uint8, cols * rws
                )
                off += cols * rws
            if self.is_pos:
                masks[i] = np.fromfile(fin, "<i4", 1)[0]
                gts[i] = np.fromfile(fin, "<f8", L2)
            curs[i] = np.fromfile(fin, "<f8", L2)
            scores[i], weights[i] = np.fromfile(fin, "<f8", 2)
        self.imgs = rows
        self.gt_shapes = gts
        self.shape_mask = masks
        self.current_shapes = curs
        self.scores = scores
        self.last_scores = np.zeros(n)
        self.weights = weights
        self.stp_mc = st_identity(n)
        self.stp_cm = st_identity(n)
        self.live = np.ones(n, bool)
        self.invalidate()

    @staticmethod
    def snapshot(pos: "DataSet", neg: "DataSet", path: str) -> None:
        with open(path, "wb") as f:
            pos.write_to(f)
            neg.write_to(f)

    @staticmethod
    def resume(path: str, pos: "DataSet", neg: "DataSet") -> None:
        with open(path, "rb") as f:
            pos.read_from(f)
            neg.read_from(f)


# ---------------------------------------------------------------------------
# NegGenerator: streaming hard-negative proposals (data.cpp:880-1197)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _ScanState:
    current_idx: int
    x: int = 0
    y: int = 0
    win_size: int = 0
    factor: float = 1.2
    step: int = 4
    transform_type: int = 0
    reset: int = 0
    hd_idx: int = 0
    bg_img: Optional[np.ndarray] = None
    bg_ver: int = 0  # bumped on every bg_img change (device-miner cache key)
    rng: Optional[np.random.Generator] = None  # per-state stream (like the
    # reference's per-thread cv::RNGs, common.cpp:233-238) so the window
    # stream is invariant to how states are interleaved into batches


class NegGenerator:
    """Sliding-window proposal stream over background images.

    The reference runs thread_n OpenMP workers each owning a scan state and
    validating one window at a time (data.cpp:971-1012).  Here the same
    state machines produce *batches* of candidate patches that a device
    validator (the partial cascade) accepts or rejects in bulk — the
    TPU-native shape of the producer pool (SURVEY.md §2 P4).
    """

    def __init__(self, c: Config, n_states: int = 8):
        self.c = c
        self.n_states = n_states
        self.list: List[str] = []
        self.hards: List[np.ndarray] = []
        self.states: List[_ScanState] = []
        self._loader: Callable[[str], Optional[np.ndarray]] = self._imread

    @staticmethod
    def _imread(path: str) -> Optional[np.ndarray]:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        return img

    def load(self, bg_txts: Sequence[str], rng: np.random.Generator) -> None:
        """NegGenerator::Load (data.cpp:1067-1196): bg_txts[0] is the hard
        pool (text list or binary cache, consumed first when
        config.use_hard), the rest are background image lists."""
        self.list = []
        for p in bg_txts[1:]:
            with open(p) as f:
                self.list.extend(f.read().split())
        rng.shuffle(self.list)
        self.hards = []
        if self.c.use_hard and bg_txts:
            self._load_hard(bg_txts[0], rng)
        self._init_states(rng)

    def _load_hard(self, path: str, rng: np.random.Generator) -> None:
        import cv2

        c = self.c
        if path.endswith("txt"):
            with open(path) as f:
                names = f.read().split()
            for nm in names:
                img = cv2.imread(nm, cv2.IMREAD_GRAYSCALE)
                if img is None:
                    continue
                self.hards.append(
                    cv2.resize(img, (c.img_o_size, c.img_o_size))
                )
            # binary cache, reference hard.data format (data.cpp:1149-1167)
            with open(os.path.join(os.path.dirname(path), "hard.data"), "wb") as f:
                np.asarray([len(self.hards)], "<i4").tofile(f)
                for img in self.hards:
                    np.asarray([img.shape[1], img.shape[0]], "<i4").tofile(f)
                    img.astype(np.uint8).tofile(f)
        else:
            with open(path, "rb") as f:
                (n,) = np.fromfile(f, "<i4", 1)
                for _ in range(int(n)):
                    cols, rws = np.fromfile(f, "<i4", 2)
                    if cols == 0 or rws == 0:
                        continue
                    self.hards.append(
                        np.fromfile(f, np.uint8, cols * rws).reshape(rws, cols)
                    )
        rng.shuffle(self.hards)

    def load_images(self, images: List[np.ndarray], rng: np.random.Generator) -> None:
        """In-memory variant (tests / embedded use)."""
        self.list = [f"<mem:{i}>" for i in range(len(images))]
        self._mem = images
        self._loader = lambda p: self._mem[int(p[5:-1])]
        self._init_states(rng)

    def load_factory(
        self,
        factory: Callable[[int], np.ndarray],
        rng: np.random.Generator,
        virtual_n: int = 65536,
    ) -> None:
        """Unbounded background supply: image i is `factory(i)` (must be
        deterministic per index), generated lazily with a small LRU so the
        scan states can wrap a virtually-infinite list.  Stands in for the
        reference's large on-disk background corpora (nega/*.txt lists,
        data.cpp:1067-1196) in environments that generate data."""
        import functools

        self.list = [f"<gen:{i}>" for i in range(virtual_n)]
        cached = functools.lru_cache(maxsize=1024)(factory)
        self._loader = lambda p: cached(int(p[5:-1]))
        self._init_states(rng)

    def _init_states(self, rng: np.random.Generator) -> None:
        c = self.c
        self.states = []
        for i in range(self.n_states):
            s = _ScanState(current_idx=i % max(len(self.list), 1))
            s.rng = np.random.default_rng(rng.integers(2**63))
            s.win_size = c.img_o_size
            s.factor = s.rng.uniform(1.1, 1.5)
            s.step = int(s.rng.integers(2, c.img_q_size))
            s.bg_img = self._loader(self.list[s.current_idx])
            s.hd_idx = i
            self.states.append(s)
        self._rng = rng

    def _transform(self, img: np.ndarray, t: int) -> np.ndarray:
        import cv2

        if t == 0:
            return img
        if t == 1:
            return cv2.transpose(cv2.flip(img, 0))
        if t == 2:
            return cv2.flip(img, -1)
        if t == 3:
            return cv2.transpose(cv2.flip(img, 1))
        if t == 4:
            return cv2.flip(img, 1)
        if t == 5:
            return cv2.transpose(cv2.flip(img, -1))
        if t == 6:
            return cv2.flip(cv2.flip(img, -1), 1)
        return cv2.flip(cv2.transpose(cv2.flip(img, 0)), 1)

    def next_patch(self, sid: int) -> np.ndarray:
        """NextImage (data.cpp:885-966): one square candidate patch."""
        kind, payload = self.next_window(sid)
        if kind == "hard":
            return payload
        y, x, w = payload
        s = self.states[sid]
        return s.bg_img[y : y + w, x : x + w].copy()

    def next_window(self, sid: int):
        """Advance state `sid` one step; return ("hard", patch) for a
        hard-pool entry or ("scan", (y, x, win_size)) for a window of the
        state's CURRENT bg_img.  Factoring the coordinates out of
        next_patch lets the device miner (train/mining.py) synthesize the
        crop+resize on device from a resident background — same window
        stream, no per-window host crop."""
        s = self.states[sid]
        c = self.c
        if s.hd_idx < len(self.hards):
            patch = self.hards[s.hd_idx]
            s.hd_idx += self.n_states
            return "hard", patch
        s.x += s.step
        if s.x + s.win_size > s.bg_img.shape[1]:
            s.x = 0
            s.y += s.step
            if s.y + s.win_size > s.bg_img.shape[0]:
                s.y = 0
                s.win_size = int(s.win_size * s.factor)
                if (
                    s.win_size >= s.bg_img.shape[1]
                    or s.win_size >= s.bg_img.shape[0]
                ):
                    s.win_size = c.img_o_size
                    s.factor = s.rng.uniform(1.1, 1.5)
                    s.step = int(s.rng.integers(2, c.img_q_size))
                    # NOTE: the reference's advance loop (data.cpp:913-925)
                    # never loads an image on the wraparound iteration, so
                    # it spins forever when list size <= thread stride; we
                    # load after wrapping (and bound pathological lists)
                    for _ in range(8 * len(self.list) + 8):
                        s.current_idx += self.n_states
                        if s.current_idx >= len(self.list):
                            s.current_idx %= len(self.list)
                            s.transform_type = (s.transform_type + 1) % 8
                            s.reset += 1
                        img = self._loader(self.list[s.current_idx])
                        if (
                            img is not None
                            and img.shape[1] > s.win_size
                            and img.shape[0] > s.win_size
                        ):
                            s.bg_img = self._transform(img, s.transform_type)
                            s.bg_ver += 1
                            break
                    else:
                        raise RuntimeError(
                            "no background image larger than the scan window"
                        )
        return "scan", (s.y, s.x, s.win_size)

    def report_bg_used(self) -> int:
        base = max(len(self.list), 1) // self.n_states
        return sum(
            s.current_idx // self.n_states + s.reset * base for s in self.states
        )

    def generate(
        self,
        validate_fn: Callable,
        size: int,
        batch: int = 512,
        max_batches: int = 2000,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
        """Mine up to `size` accepted patches.  validate_fn(rows [B, D]
        uint8) -> (is_face [B] bool, score [B], shape [B, 2L], nvis [B]).
        Returns (rows, scores, shapes, stats).

        max_batches bounds the proposal stream — the reference spins
        forever when the background pool has no hard negatives left
        (data.cpp:971-1012); a production trainer must make progress and
        report the shortfall instead."""
        c = self.c
        acc_rows, acc_scores, acc_shapes = [], [], []
        nega_n = 0
        carts_n = 0
        got = 0
        n_batches = 0
        while got < size and n_batches < max_batches:
            n_batches += 1
            rows = np.zeros((batch, sum(d * d for d in (c.img_o_size, c.img_h_size, c.img_q_size))), np.uint8)
            for b in range(batch):
                patch = self.next_patch(b % self.n_states)
                rows[b] = patch_row(patch, c)
            ok, score, shape, nvis = validate_fn(rows)
            nega_n += int((~ok).sum())
            carts_n += int(nvis[~ok].sum())
            take = np.flatnonzero(ok)[: size - got]
            if len(take):
                acc_rows.append(rows[take])
                acc_scores.append(score[take])
                acc_shapes.append(shape[take])
                got += len(take)
        stats = {
            "exhausted": got < size,
            "not_hard": nega_n,
            "avg_reject_carts": carts_n / max(nega_n, 1),
            "fp_rate": got / max(got + nega_n, 1),
            "bg_used": self.report_bg_used(),
        }
        if not acc_rows:
            D = sum(d * d for d in (c.img_o_size, c.img_h_size, c.img_q_size))
            L2 = c.landmark_dim
            return (
                np.zeros((0, D), np.uint8),
                np.zeros(0),
                np.zeros((0, L2)),
                stats,
            )
        return (
            np.concatenate(acc_rows),
            np.concatenate(acc_scores),
            np.concatenate(acc_shapes),
            stats,
        )

    # -- on-demand hard-candidate stream --------------------------------

    def load_hard_factory(self, factory: Callable[[int], np.ndarray]) -> None:
        """Unbounded pre-registered hard-candidate supply.

        The reference consumes a finite pre-collected hard pool before
        scanning backgrounds (data.cpp:893-897, loaded at 1102-1196).
        `factory(i)` must deterministically return a square uint8 patch —
        a candidate already registered to the detection window (unlike
        scan windows, which rarely align with tile content).  The trainer
        draws on this stream only when the background scan under-delivers
        (generate_hard), so early-stage pools keep the scan's texture
        diversity and deep stages get an inexhaustible supply of
        near-misses the cascade must learn to reject.

        A two-argument factory `factory(i, difficulty)` opts into the
        ADAPTIVE LADDER: generate_hard tracks a difficulty in [0, 1] and
        raises it whenever a batch's acceptance rate falls under 10%
        (lowers it above 35%).  Without adaptation the cascade's false-
        positive rate on a fixed candidate distribution decays roughly
        exponentially in trained carts, and each mining event costs
        1/FP host-rendered candidates — the ladder holds acceptance (and
        therefore mining wall-clock) roughly constant all the way to
        stage 5 by moving candidates toward the decision boundary as the
        cascade sharpens."""
        self.hard_factory = factory
        self._hard_cursor = 0
        self._hard_difficulty = 0.0
        try:
            import inspect

            n_par = len(inspect.signature(factory).parameters)
        except (TypeError, ValueError):
            n_par = 1
        self._hard_adaptive = n_par >= 2

    def load_canvas_factory(self, factory: Callable) -> None:
        """Device-batched near-miss supply (train/mining.CanvasHardMiner).

        `factory(i, difficulty) -> (canvas u8 [C, C], (fx, fy, fsize),
        any_window)` deterministically renders a face CANVAS: a face of
        box (fx, fy, fsize) inside clutter margin.  The miner extracts
        many candidate windows per canvas ON DEVICE (host rendering is
        the mining bottleneck on a 1-core host: ~1 ms/candidate at <1%
        deep-stage acceptance), so one render amortizes over dozens of
        screened windows.  `any_window=True` marks an off-manifold face
        (distorted landmarks / occlusion): every window overlapping it is
        a legitimate negative.  `any_window=False` marks a TRUE face:
        only windows with IoU < 0.48 against the face box are sampled
        (boundary negatives — the support vectors of detection).

        Shares the adaptive difficulty ladder with generate_hard."""
        self.canvas_factory = factory
        self._canvas_cursor = 0
        if not hasattr(self, "_hard_difficulty"):
            self._hard_difficulty = 0.0

    def generate_hard(
        self,
        validate_fn: Callable,
        size: int,
        batch: int = 512,
        max_batches: int = 200,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
        """Mine up to `size` accepted patches from the hard factory.
        Same contract as generate(); candidates are validated by the
        current partial cascade exactly like scan windows (the hard pool
        is a *proposal* stream, acceptance is always Validate's call —
        data.cpp:983-987)."""
        c = self.c
        factory = getattr(self, "hard_factory", None)
        assert factory is not None, "load_hard_factory first"
        acc_rows, acc_scores, acc_shapes = [], [], []
        nega_n = 0
        carts_n = 0
        got = 0
        n_batches = 0
        D = sum(d * d for d in (c.img_o_size, c.img_h_size, c.img_q_size))
        adaptive = getattr(self, "_hard_adaptive", False)
        while got < size and n_batches < max_batches:
            n_batches += 1
            rows = np.zeros((batch, D), np.uint8)
            for b in range(batch):
                if adaptive:
                    p = factory(self._hard_cursor, self._hard_difficulty)
                else:
                    p = factory(self._hard_cursor)
                rows[b] = patch_row(p, c)
                self._hard_cursor += 1
            ok, score, shape, nvis = validate_fn(rows)
            nega_n += int((~ok).sum())
            carts_n += int(nvis[~ok].sum())
            if adaptive:
                # ladder headroom past 1.0: at 1.0 the round-4 flagship
                # run saturated and stages 1-4 truncated 9-23 carts to
                # mining exhaustion; the (1, 2] band maps to even-harder
                # factory composites (train_flagship._d2)
                rate = float(ok.mean())
                if rate < 0.10:
                    self._hard_difficulty = min(
                        2.0, self._hard_difficulty + 0.15
                    )
                elif rate > 0.35:
                    self._hard_difficulty = max(
                        0.0, self._hard_difficulty - 0.05
                    )
            take = np.flatnonzero(ok)[: size - got]
            if len(take):
                acc_rows.append(rows[take])
                acc_scores.append(score[take])
                acc_shapes.append(shape[take])
                got += len(take)
        stats = {
            "exhausted": got < size,
            "not_hard": nega_n,
            "avg_reject_carts": carts_n / max(nega_n, 1),
            "fp_rate": got / max(got + nega_n, 1),
            "bg_used": 0,
            "difficulty": getattr(self, "_hard_difficulty", 0.0),
        }
        if not acc_rows:
            return (
                np.zeros((0, D), np.uint8),
                np.zeros(0),
                np.zeros((0, c.landmark_dim)),
                stats,
            )
        return (
            np.concatenate(acc_rows),
            np.concatenate(acc_scores),
            np.concatenate(acc_shapes),
            stats,
        )
