"""Shape-indexed pixel-difference features, batched over (sample, feature).

The reference evaluates one feature on one sample at a time
(Feature::CalcFeatureValue, /root/reference/src/jda/data.cpp:18-58) inside
an OpenMP loop over the pool x node-samples matrix
(DataSet::CalcFeatureValues, data.cpp:148-173).  Here the whole [M, F]
matrix is two batched gathers from a flat uint8 buffer:

    pix = base[m, scale[f]] + y * stride[m, scale[f]] + x
    val = flat[pix1] - flat[pix2]

which is the same addressing scheme the detection kernel uses
(jda_tpu/ops/cascade.py), so corpora and image pyramids share one code path.

Feature pools are generated host-side with a deterministic numpy Generator
(the reference seeds per-thread cv::RNGs from the tick counter,
common.cpp:233-238 — nondeterministic; determinism here is deliberate).
Sampling semantics match Cart::GenFeaturePool (cart.cpp:352-390): offsets
rejection-sampled from the unit disk scaled by the stage radius, uniform
landmark pair, uniform scale in {O,H,Q} when multi_scale else ORIGIN.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass
class FeaturePool:
    """SoA pool of F candidate split features."""

    scale: np.ndarray  # [F] int32 in {0, 1, 2}
    lmk1: np.ndarray  # [F] int32
    lmk2: np.ndarray  # [F] int32
    off1: np.ndarray  # [F, 2] float32 (mean-shape-frame offsets)
    off2: np.ndarray  # [F, 2] float32

    def __len__(self) -> int:
        return len(self.scale)

    def select(self, i: int) -> Tuple[int, int, int, np.ndarray, np.ndarray]:
        return (
            int(self.scale[i]),
            int(self.lmk1[i]),
            int(self.lmk2[i]),
            self.off1[i].copy(),
            self.off2[i].copy(),
        )

    def device(self) -> Dict[str, jnp.ndarray]:
        return {
            "scale": jnp.asarray(self.scale, jnp.int32),
            "lmk1": jnp.asarray(self.lmk1, jnp.int32),
            "lmk2": jnp.asarray(self.lmk2, jnp.int32),
            "off1": jnp.asarray(self.off1, jnp.float32),
            "off2": jnp.asarray(self.off2, jnp.float32),
        }


def gen_feature_pool(
    rng: np.random.Generator,
    n: int,
    landmark_n: int,
    radius: float,
    multi_scale: bool,
) -> FeaturePool:
    """Random pool, semantics of Cart::GenFeaturePool (cart.cpp:352-390)."""

    def unit_disk(k):
        pts = rng.uniform(-1.0, 1.0, (k, 2))
        bad = (pts**2).sum(-1) > 1.0
        while bad.any():
            pts[bad] = rng.uniform(-1.0, 1.0, (int(bad.sum()), 2))
            bad = (pts**2).sum(-1) > 1.0
        return pts

    scale = (
        rng.integers(0, 3, n).astype(np.int32)
        if multi_scale
        else np.zeros(n, np.int32)
    )
    return FeaturePool(
        scale=scale,
        lmk1=rng.integers(0, landmark_n, n).astype(np.int32),
        lmk2=rng.integers(0, landmark_n, n).astype(np.int32),
        off1=(unit_disk(n) * radius).astype(np.float32),
        off2=(unit_disk(n) * radius).astype(np.float32),
    )


def corpus_geometry(
    n: int, dims: Tuple[int, int, int]
) -> Dict[str, np.ndarray]:
    """Per-sample scale geometry for a corpus stored as [N, D] flat patches.

    D = sum(d*d); sample i's scale-s patch starts at i*D + offset[s] in the
    flattened [N*D] buffer.  This makes a training corpus addressable by the
    same (base, stride, pw, ph) scheme as detection windows.
    """
    D = sum(d * d for d in dims)
    offs = np.cumsum([0] + [d * d for d in dims[:-1]])
    base = (np.arange(n, dtype=np.int64)[:, None] * D + offs[None, :]).astype(
        np.int32
    )
    dims_a = np.asarray(dims, np.int32)
    stride = np.broadcast_to(dims_a, (n, 3)).copy()
    return {
        "base": base,
        "stride": stride,
        "pw": stride.copy(),
        "ph": stride.copy(),
    }


def _round_half_away(x):
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5)).astype(
        jnp.int32
    )


def feature_values_mxu(
    canvas: jnp.ndarray,  # [M, S, S] int8 (pixel - 128)
    shapes: jnp.ndarray,  # [M, 2L] float32
    pool: Dict[str, jnp.ndarray],  # device FeaturePool (single-scale)
    stp: Optional[jnp.ndarray] = None,
    chunk: int = 256,
) -> jnp.ndarray:
    """[M, F] feature matrix with ZERO gathers: pixel extraction as one-hot
    MXU contractions.

    TPU gathers sustain ~50-135 M elem/s (the scalar-issue wall), which
    made the [M, F] feature matrix the training bottleneck.  A pixel read
    img[y, x] is the bilinear form e_y^T . img . e_x, so a whole feature
    chunk becomes two int8 einsums: tmp[m,f,x] = sum_y ohy[m,f,y] img[m,y,x]
    (batched matmul, one non-zero per row -> exact int32), then
    v[m,f] = sum_x tmp ohx.  Pixels are stored as int8 (p - 128); the
    difference v1 - v2 cancels the shift, so results are bit-identical to
    the gather path (measured ~40x faster at M=8k, F=2000).

    Restriction: single-scale pools over square [S, S] patches (the
    shipped config; multi-scale pools keep the gather path).
    """
    M, S, _ = canvas.shape
    L = shapes.shape[1] // 2
    shape_xy = shapes.reshape(M, L, 2)
    F = pool["lmk1"].shape[0]
    Sf = jnp.float32(S)

    def coords(lmk, off):
        pt = shape_xy[:, lmk]  # [M, F, 2]
        if stp is None:
            o = jnp.broadcast_to(off[None], (M,) + off.shape)
        else:
            o = jnp.einsum("mij,fj->mfi", stp, off)
        x = _round_half_away((pt[..., 0] + o[..., 0]) * Sf)
        y = _round_half_away((pt[..., 1] + o[..., 1]) * Sf)
        return jnp.clip(x, 0, S - 1), jnp.clip(y, 0, S - 1)

    x1, y1 = coords(pool["lmk1"], pool["off1"])
    x2, y2 = coords(pool["lmk2"], pool["off2"])
    iota = jnp.arange(S, dtype=jnp.int32)

    def extract(x, y, f0, f1):
        ohy = (y[:, f0:f1, None] == iota).astype(jnp.int8)  # [M, FC, S]
        ohx = (x[:, f0:f1, None] == iota).astype(jnp.int8)
        tmp = jnp.einsum(
            "mfy,myx->mfx", ohy, canvas, preferred_element_type=jnp.int32
        ).astype(jnp.int8)  # row values are (pixel - 128): int8-exact
        return jnp.einsum(
            "mfx,mfx->mf", tmp, ohx, preferred_element_type=jnp.int32
        )

    outs = []
    for f0 in range(0, F, chunk):
        f1 = min(f0 + chunk, F)
        outs.append(extract(x1, y1, f0, f1) - extract(x2, y2, f0, f1))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def feature_values(
    flat: jnp.ndarray,  # [total] uint8 flat image buffer
    geom: Dict[str, jnp.ndarray],  # base/stride/pw/ph, each [M, 3]
    shapes: jnp.ndarray,  # [M, 2L] float32
    pool: Dict[str, jnp.ndarray],  # device FeaturePool
    stp: Optional[jnp.ndarray] = None,  # [M, 2, 2] similarity (rot*scale)
) -> jnp.ndarray:
    """[M, F] int32 feature matrix (C++ training semantics: round + clamp).

    stp rotates/scales the mean-shape-frame offsets into the sample's
    current-shape frame (STParameter::Apply on offsets, data.cpp:41-42);
    None means identity (similarity_transform=false, the shipped config).
    """
    M = shapes.shape[0]
    L = shapes.shape[1] // 2
    shape_xy = shapes.reshape(M, L, 2)

    sc = pool["scale"]  # [F]
    base = geom["base"][:, sc]  # [M, F]
    stride = geom["stride"][:, sc]
    pw = geom["pw"][:, sc]
    ph = geom["ph"][:, sc]
    pwf = pw.astype(jnp.float32)
    phf = ph.astype(jnp.float32)

    def sample(lmk, off):
        pt = shape_xy[:, lmk]  # [M, F, 2]
        if stp is None:
            o = jnp.broadcast_to(off[None], (M,) + off.shape)  # [M, F, 2]
        else:
            # o[m, f] = stp[m] @ off[f]
            o = jnp.einsum("mij,fj->mfi", stp, off)
        x = _round_half_away((pt[..., 0] + o[..., 0]) * pwf)
        y = _round_half_away((pt[..., 1] + o[..., 1]) * phf)
        x = jnp.clip(x, 0, pw - 1)
        y = jnp.clip(y, 0, ph - 1)
        return jnp.take(flat, base + y * stride + x).astype(jnp.int32)

    v1 = sample(pool["lmk1"], pool["off1"])
    v2 = sample(pool["lmk2"], pool["off2"])
    return v1 - v2
