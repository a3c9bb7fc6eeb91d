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
