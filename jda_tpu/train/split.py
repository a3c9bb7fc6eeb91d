"""Device split search: the training inner loop.

The reference scans 511-bin weighted histograms per candidate feature in an
OpenMP loop (Cart::SplitNodeWithClassification,
/root/reference/src/jda/cart.cpp:176-252) and per-feature sorted percentile
thresholds for regression (SplitNodeWithRegression, cart.cpp:288-350).
Here both are single fused tensor programs:

  * classification: one segment-sum builds all F x 511 weighted histograms,
    a cumulative sum turns them into every possible (feature, threshold)
    split, and a masked reduction picks the minimum-entropy pair;
  * regression: a batched sort + gather picks each feature's random
    percentile threshold, and masked moment sums give the size-weighted
    residual-variance objective.

Tie-breaking matches the reference scan order (first feature / first
threshold achieving the minimum wins; thresholds must be *strictly* better
than the parent to be taken).

Cross-path determinism: boosting weights arrive quantized to multiples of
2^-23 (DataSet.update_weights) and split residuals are quantized to
multiples of 2^-RESID_FRAC_BITS here, so every reduction feeding a split
decision — histogram contraction, cumsum over bins, psum over a device
mesh — is an exact fixed-point sum whose value is independent of
association order.  The decision metrics additionally pass through a
mantissa truncation (_quantize_metric) before argmin, so the single-chip
and mesh-sharded trainers pick bit-identical (feature, threshold) pairs
(the reference's OpenMP training is run-to-run nondeterministic; this is
deliberately stronger — SURVEY.md §2 P7).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NBINS = 511  # feature values live in [-255, 255] (cart.cpp:194-199)

# residual fixed-point grid: 2^-10 keeps sums of up to ~16k quanta-bounded
# residuals (|r| <= ~0.5 after shape init) exactly representable in f32
RESID_FRAC_BITS = 10

_METRIC_DROP_BITS = 12  # mantissa bits truncated before argmin


def quantize_residual(r: jnp.ndarray) -> jnp.ndarray:
    """Round to the fixed residual grid (same op host-side via np.round)."""
    q = jnp.float32(1 << RESID_FRAC_BITS)
    return jnp.round(r.astype(jnp.float32) * q) / q


def _quantize_metric(x: jnp.ndarray) -> jnp.ndarray:
    """Truncate _METRIC_DROP_BITS low mantissa bits (monotone, sign-safe):
    a fixed quantization so sub-ulp-scale arithmetic differences between
    differently-compiled programs cannot flip an argmin."""
    i = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    mask = jnp.int32(~((1 << _METRIC_DROP_BITS) - 1))
    out = jax.lax.bitcast_convert_type(i & mask, jnp.float32)
    # preserve non-finite sentinels exactly (inf stays inf; masked-off
    # lanes use inf to lose every argmin)
    return jnp.where(jnp.isfinite(x), out, x)


def _entropy(p: jnp.ndarray) -> jnp.ndarray:
    """calcEntropy (cart.cpp:166-171): 0 at the degenerate ends."""
    safe = jnp.clip(p, 1e-12, 1.0 - 1e-12)
    h = -(safe * jnp.log(safe) + (1.0 - safe) * jnp.log(1.0 - safe)) / jnp.log(
        2.0
    )
    degenerate = (jnp.abs(p) < 1e-9) | (jnp.abs(1.0 - p) < 1e-9)
    return jnp.where(degenerate, 0.0, h)


def _hists_segsum(vals: jnp.ndarray, w: jnp.ndarray, valid: jnp.ndarray):
    """[F, 511] histograms via scatter-add (reference implementation for
    cross-checks; TPU scatter sustains ~40 M updates/s — see _hists)."""
    M, F = vals.shape
    bins = jnp.clip(vals + 255, 0, NBINS - 1)
    ids = bins + jnp.arange(F, dtype=jnp.int32)[None, :] * NBINS  # [M, F]
    data = jnp.stack(
        [
            jnp.broadcast_to(w[:, None], (M, F)),
            jnp.broadcast_to(valid.astype(jnp.float32)[:, None], (M, F)),
        ],
        axis=-1,
    )  # [M, F, 2]
    seg = jax.ops.segment_sum(
        data.reshape(M * F, 2),
        ids.reshape(M * F),
        num_segments=F * NBINS,
    ).reshape(F, NBINS, 2)
    return seg[..., 0], seg[..., 1]


_HI, _LO = 16, 32  # 511 bins factored as hi*32 + lo (512th slot stays 0)


def _hists(vals: jnp.ndarray, w: jnp.ndarray, valid: jnp.ndarray, chunk=256):
    """[F, 511] weight and count histograms from a [M, F] value matrix.

    TPU scatter-add (segment_sum) is scalar-issue bound (~1 s for
    8k x 2000 updates), so the histogram is computed on the MXU instead:
    factor bin = hi*32 + lo and contract over samples,

        hist[f, hi, lo] = sum_m a_m * onehot_hi[m,f,hi] * onehot_lo[m,f,lo]

    i.e. one batched [16, M] x [M, 32] matmul per feature.  Counts use
    int8 one-hots (exact int32); weight sums use float32 with HIGHEST
    precision (each product is w_m * 1 — exact; only the accumulation
    order differs from the scatter path, like any parallel reduction).
    """
    M, F = vals.shape
    bins = jnp.clip(vals + 255, 0, NBINS - 1)
    hi = bins // _LO
    lo = bins % _LO
    ih = jnp.arange(_HI, dtype=jnp.int32)
    il = jnp.arange(_LO, dtype=jnp.int32)
    vi8 = valid.astype(jnp.int8)[:, None, None]
    wcol = w[:, None, None]
    outs_w, outs_c = [], []
    for f0 in range(0, F, chunk):
        f1 = min(f0 + chunk, F)
        mh = hi[:, f0:f1, None] == ih  # [M, FC, 16] bool
        ml = lo[:, f0:f1, None] == il  # [M, FC, 32] bool
        cnt = jnp.einsum(
            "mfh,mfl->fhl",
            mh.astype(jnp.int8) * vi8,
            ml.astype(jnp.int8),
            preferred_element_type=jnp.int32,
        )
        wgt = jnp.einsum(
            "mfh,mfl->fhl",
            jnp.where(mh, wcol, 0.0).astype(jnp.float32),
            ml.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        outs_c.append(cnt.reshape(f1 - f0, _HI * _LO)[:, :NBINS])
        outs_w.append(wgt.reshape(f1 - f0, _HI * _LO)[:, :NBINS])
    wh = outs_w[0] if len(outs_w) == 1 else jnp.concatenate(outs_w)
    ch = outs_c[0] if len(outs_c) == 1 else jnp.concatenate(outs_c)
    return wh, ch.astype(jnp.float32)


def classification_split_from_hists(
    wp: jnp.ndarray,  # [F, 511] summed positive weights per bin
    cp: jnp.ndarray,  # [F, 511] positive counts per bin
    wn: jnp.ndarray,
    cn: jnp.ndarray,
    pos_n: jnp.ndarray,  # scalar f32
    neg_n: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decision half of the classification split — on multi-chip meshes the
    histograms arrive psum'd over the sample axis (SURVEY.md §2 P1/P2)."""
    wp_tot = jnp.sum(wp, axis=1, keepdims=True)  # [F, 1]
    wn_tot = jnp.sum(wn, axis=1, keepdims=True)
    w_tot = wp_tot + wn_tot

    wp_l = jnp.cumsum(wp, axis=1)  # inclusive: th = bin - 255
    wn_l = jnp.cumsum(wn, axis=1)
    cp_l = jnp.cumsum(cp, axis=1)
    cn_l = jnp.cumsum(cn, axis=1)
    wp_r = wp_tot - wp_l
    wn_r = wn_tot - wn_l
    w_l = wp_l + wn_l
    w_r = wp_r + wn_r

    # child fraction constraints (cart.cpp:225-228); an empty side passes
    # vacuously (0/0 is NaN in the reference and NaN fails both comparisons)
    def ratio_ok(cnt, total):
        r = cnt / jnp.maximum(total, 1.0)
        return (total == 0) | ((r >= 0.1) & (r <= 0.9))

    ok = ratio_ok(cp_l, pos_n) & ratio_ok(cn_l, neg_n)

    e = (w_l / w_tot) * _entropy(wp_l / jnp.maximum(w_l, 1e-30)) + (
        w_r / w_tot
    ) * _entropy(wp_r / jnp.maximum(w_r, 1e-30))
    e = _quantize_metric(jnp.where(ok, e, jnp.inf))

    parent = _quantize_metric(_entropy(wp_tot[:, 0] / w_tot[:, 0]))  # [F]
    best_e = jnp.min(e, axis=1)
    best_th = jnp.argmin(e, axis=1).astype(jnp.int32) - 255
    improved = best_e < parent  # strict (cart.cpp:233)
    es = jnp.where(improved, best_e, parent)
    ths = jnp.where(improved, best_th, -256)

    f_idx = jnp.argmin(es).astype(jnp.int32)
    return f_idx, ths[f_idx], es[f_idx]


@jax.jit
def classification_split(
    vals_pos: jnp.ndarray,  # [Mp, F] int32
    w_pos: jnp.ndarray,  # [Mp] f32 (0 on padded lanes)
    valid_pos: jnp.ndarray,  # [Mp] bool
    vals_neg: jnp.ndarray,  # [Mn, F] int32
    w_neg: jnp.ndarray,  # [Mn] f32
    valid_neg: jnp.ndarray,  # [Mn] bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Minimum weighted-entropy (feature, threshold) pair.

    Returns (feature_idx int32, threshold int32, entropy f32); threshold
    -256 sends every sample right (cart.cpp:186-187).
    """
    wp, cp = _hists(vals_pos, w_pos, valid_pos)  # [F, 511] each
    wn, cn = _hists(vals_neg, w_neg, valid_neg)
    pos_n = jnp.sum(valid_pos.astype(jnp.float32))
    neg_n = jnp.sum(valid_neg.astype(jnp.float32))
    return classification_split_from_hists(wp, cp, wn, cn, pos_n, neg_n)


@jax.jit
def regression_split(
    vals_pos: jnp.ndarray,  # [Mp, F] int32
    residual: jnp.ndarray,  # [Mp, 2] f32 (cart-landmark residual, mean frame)
    has_gt: jnp.ndarray,  # [Mp] bool
    valid_pos: jnp.ndarray,  # [Mp] bool
    u: jnp.ndarray,  # [F] f32 random percentiles in [0.1, 0.9)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Minimum size-weighted residual-variance split (cart.cpp:288-350).

    Thresholds are each feature's value at a random percentile of the
    sorted positives; variance counts only samples with a gt shape.
    Returns (feature_idx, threshold, metric).

    The reference objective n_l*var_l + n_r*var_r equals
    sum(r^2 over both sides) - (S_l^2/n_l + S_r^2/n_r) with S = sum of
    residuals per side; the first term is feature-independent, so the
    argmin is computed from the SUFFICIENT STATISTICS (S_l, n_l) alone.
    With residuals on the fixed-point grid those sums are exact in any
    reduction order (single chip == any mesh, bit-for-bit), which the
    m2 - m1^2 form could not guarantee (sum of squares overflows the
    exact-f32 fixed-point range).
    """
    Mp, F = vals_pos.shape
    pos_n = jnp.sum(valid_pos.astype(jnp.int32))
    residual = quantize_residual(residual)

    # exact k-th order statistic from the count histogram: values are ints
    # in [-255, 255], so sorted_vals[idx] == the smallest bin whose CDF
    # reaches idx+1 (a full [Mp, F] sort is scalar-bound on TPU)
    _, cnt = _hists(vals_pos, jnp.zeros_like(valid_pos, jnp.float32), valid_pos)
    idx = (pos_n.astype(jnp.float32) * u).astype(jnp.int32)  # trunc
    cum = jnp.cumsum(cnt, axis=1)  # [F, 511]
    th = (
        jnp.argmax(cum >= (idx + 1)[:, None].astype(jnp.float32), axis=1)
        .astype(jnp.int32)
        - 255
    )

    gtv = (has_gt & valid_pos).astype(jnp.float32)  # [Mp]
    left = (vals_pos <= th[None, :]).astype(jnp.float32) * gtv[:, None]

    n_tot = jnp.sum(gtv)
    nl = jnp.sum(left, axis=0)  # [F]
    nr = n_tot - nl
    metric = regression_metric_from_sums(
        *[
            (
                jnp.sum(left * residual[:, d : d + 1], axis=0),
                jnp.sum(gtv * residual[:, d]),
            )
            for d in range(2)
        ],
        nl=nl,
        nr=nr,
    )

    f_idx = jnp.argmin(metric).astype(jnp.int32)
    out_f = jnp.where(pos_n > 0, f_idx, 0)
    out_th = jnp.where(pos_n > 0, th[f_idx], jnp.int32(-256))
    return out_f, out_th, metric[f_idx]


def regression_metric_from_sums(sums_x, sums_y, *, nl, nr):
    """Decision half of the regression split from per-side residual sums.

    sums_* = (S_l [F], S_tot scalar) per coordinate; on a mesh the S_l /
    n_l arrive psum'd (exact fixed-point sums).  Returns the (quantized)
    metric to argmin: -(S_l^2/n_l + S_r^2/n_r) summed over coordinates —
    the reference's size-weighted variance objective minus its
    feature-independent constant (see regression_split).
    """
    safe_l = jnp.maximum(nl, 1.0)
    safe_r = jnp.maximum(nr, 1.0)
    obj = 0.0
    for S_l, S_tot in (sums_x, sums_y):
        S_r = S_tot - S_l
        obj = obj + jnp.where(nl > 0, S_l * S_l / safe_l, 0.0)
        obj = obj + jnp.where(nr > 0, S_r * S_r / safe_r, 0.0)
    return _quantize_metric(-obj)


@functools.partial(jax.jit, static_argnames=("leaf_n",))
def leaf_scores(
    leaf_pos: jnp.ndarray,  # [Mp] int32 leaf index per positive
    w_pos: jnp.ndarray,  # [Mp] f32 (0 on padded/invalid lanes)
    leaf_neg: jnp.ndarray,
    w_neg: jnp.ndarray,
    *,
    leaf_n: int,
    esp: float = 2.2e-16,
) -> jnp.ndarray:
    """RealBoost leaf scores 0.5*(log(esp+Σw+) − log(esp+Σw−))
    (cart.cpp:63-88)."""
    wp = jax.ops.segment_sum(w_pos, leaf_pos, num_segments=leaf_n) + esp
    wn = jax.ops.segment_sum(w_neg, leaf_neg, num_segments=leaf_n) + esp
    return 0.5 * (jnp.log(wp) - jnp.log(wn))
