"""Lockstep batched cascade forward.

The reference evaluates one window at a time with branchy early exit
(C++ JoinCascador::Validate, /root/reference/src/jda/cascador.cpp:166-211;
C inner loop /root/reference/c/jda.c:360-414).  Here a *batch* of N candidate
windows traverses the cascade together:

  * tree descent is branchless: node = 2*node + 1 + (feat > th), three steps
    for depth-4 carts, with per-window node parameters gathered from the
    flattened SoA model;
  * the shape-indexed pixel-difference feature is two uint8 gathers from a
    flat stacked pyramid buffer (flat_idx = base + y*stride + x);
  * early exit becomes a sticky `alive` mask (rejected lanes stop updating);
    callers compact survivors between cart chunks / stages;
  * the per-stage shape update is onehot(lbf) x W — an MXU matmul
    (replacing the weight-row sums of btcart.cpp:407-424 / c/jda.c:403-411).

Window geometry is fully general so one kernel serves both reference
semantics:
  * C path (c/jda.c:340-354): windows borrow memory from full pyramid
    images, patch "width" = win_size at every scale (a reference quirk we
    reproduce deliberately), coordinates truncated toward zero;
  * C++ path (cascador.cpp:216-262, data.cpp:18-58): per-sample resized
    patches (o/h/q sizes), true per-scale dimensions, coordinates rounded
    half-away-from-zero.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """C++ round(): half away from zero (data.cpp:48-51 uses std::round)."""
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5)).astype(jnp.int32)


def trunc_toward_zero(x: jnp.ndarray) -> jnp.ndarray:
    """C (int) cast (c/jda.c:378-381)."""
    return x.astype(jnp.int32)


def st_calc_dev(shapes: jnp.ndarray, mean_shape: jnp.ndarray) -> jnp.ndarray:
    """Batched STParameter::Calc on device (data.cpp:64-114): [N, 2, 2]
    scale*rotation matrices mapping mean-shape-frame offsets into each
    window's current-shape frame.  float32, same operation order as the
    host port (jda_tpu/data.py st_calc)."""
    n = shapes.shape[0]
    x1 = shapes[:, 0::2]
    y1 = shapes[:, 1::2]
    x2 = jnp.broadcast_to(mean_shape[0::2], x1.shape)
    y2 = jnp.broadcast_to(mean_shape[1::2], y1.shape)
    tx1 = x1 - x1.mean(1, keepdims=True)
    ty1 = y1 - y1.mean(1, keepdims=True)
    tx2 = x2 - x2.mean(1, keepdims=True)
    ty2 = y2 - y2.mean(1, keepdims=True)
    s1 = jnp.sqrt((tx1**2 + ty1**2).sum(1))
    s2 = jnp.sqrt((tx2**2 + ty2**2).sum(1))
    scale = s1 / s2
    tx1n, ty1n = tx1 / s1[:, None], ty1 / s1[:, None]
    tx2n, ty2n = tx2 / s2[:, None], ty2 / s2[:, None]
    num = (ty1n * tx2n - tx1n * ty2n).sum(1)
    den = (tx1n * tx2n + ty1n * ty2n).sum(1)
    norm = jnp.sqrt(num**2 + den**2)
    sin_t = num / norm
    cos_t = den / norm
    return jnp.stack(
        [
            jnp.stack([scale * cos_t, scale * -sin_t], axis=1),
            jnp.stack([scale * sin_t, scale * cos_t], axis=1),
        ],
        axis=1,
    )


def init_state(
    n: int,
    mean_shape: jnp.ndarray,
    base: jnp.ndarray,
    stride: jnp.ndarray,
    pw: jnp.ndarray,
    ph: jnp.ndarray,
    valid: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Fresh window state: shape = mean shape (shift_size=0 detection path,
    c/jda.c:361 / test.cpp:17,75)."""
    L2 = mean_shape.shape[-1]
    return {
        "shape": jnp.broadcast_to(mean_shape, (n, L2)).astype(jnp.float32),
        "score": jnp.zeros((n,), jnp.float32),
        "alive": valid.astype(bool),
        "nvis": jnp.zeros((n,), jnp.int32),
        "base": base.astype(jnp.int32),
        "stride": stride.astype(jnp.int32),
        "pw": pw.astype(jnp.int32),
        "ph": ph.astype(jnp.int32),
    }


def _onehot_select(vec: jnp.ndarray, lmk: jnp.ndarray) -> jnp.ndarray:
    """vec[:, lmk] as a one-hot matmul: [N, L] x [L, C] -> [N, C].

    The selection matrix is one-hot, so with HIGHEST precision the result
    is bit-exact (products are x*1 / x*0; f32 splitting is lossless) while
    running on the MXU instead of the TPU's slow scalar-gather path.
    """
    L = vec.shape[1]
    S = (lmk[None, :] == jnp.arange(L, dtype=jnp.int32)[:, None]).astype(
        vec.dtype
    )
    return jnp.dot(vec, S, precision=jax.lax.Precision.HIGHEST)


def _bit_select(planes, bits):
    """Select among 2^len(bits) [N, C] planes by descent bits (MSB first)."""
    if not bits:
        return planes[0]
    half = len(planes) // 2
    lo = _bit_select(planes[:half], bits[1:])
    hi = _bit_select(planes[half:], bits[1:])
    return jnp.where(bits[0], hi, lo)


def carts_descend(
    chunk: Dict[str, jnp.ndarray],
    flat_img: jnp.ndarray,
    state: Dict[str, jnp.ndarray],
    *,
    depth: int,
    rounding: bool,
    single_scale: bool = False,
    stp: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Wide tree descent: all C carts x all N windows in parallel.

    Within a stage the trees are *independent* — the running score only
    gates whether the reference keeps evaluating (cascador.cpp:188-191),
    never which pixels a tree reads.  So the descent runs depth-1 rounds
    over an [N, C] frontier; only the cheap score-threshold chain stays
    sequential (see score_chain).

    TPU mapping: landmark coordinates come from one-hot MXU matmuls, all
    node-dependent parameters from path-bit selects (VPU), so the ONLY
    gathers are the 2 pixel reads per visited node — the irreducible
    random access of the algorithm.  `single_scale=True` (multi_scale off,
    as in the shipped reference config) skips the per-node pyramid-level
    select entirely.

    Returns (leaves [N, C], b [N, C]) where b is each cart's leaf score.
    """
    C, node_n = chunk["feat_th"].shape
    shape_x = state["shape"][:, 0::2]  # [N, L]
    shape_y = state["shape"][:, 1::2]
    to_int = round_half_away if rounding else trunc_toward_zero

    def node_indices(j):
        """Flat pixel indices (idx1, idx2) and threshold for candidate
        node j of every cart — no gathers, [N, C] elementwise + matmul."""
        if single_scale:
            base = state["base"][:, 0:1]
            stride = state["stride"][:, 0:1]
            pw = state["pw"][:, 0:1]
            ph = state["ph"][:, 0:1]
        else:
            sc = chunk["scale"][:, j][None, :]  # [1, C]
            def by_scale(a):
                return jnp.where(
                    sc == 0,
                    a[:, 0:1],
                    jnp.where(sc == 1, a[:, 1:2], a[:, 2:3]),
                )
            base = by_scale(state["base"])
            stride = by_scale(state["stride"])
            pw = by_scale(state["pw"])
            ph = by_scale(state["ph"])
        pwf = pw.astype(jnp.float32)
        phf = ph.astype(jnp.float32)

        def pt(lmk_col, off_col):
            px = _onehot_select(shape_x, lmk_col)  # [N, C]
            py = _onehot_select(shape_y, lmk_col)
            if stp is None:
                ox = off_col[None, :, 0]
                oy = off_col[None, :, 1]
            else:
                # per-window similarity transform of the mean-frame offsets
                # (STParameter::Apply on offsets, data.cpp:41-42)
                ox = (
                    stp[:, 0, 0, None] * off_col[None, :, 0]
                    + stp[:, 0, 1, None] * off_col[None, :, 1]
                )
                oy = (
                    stp[:, 1, 0, None] * off_col[None, :, 0]
                    + stp[:, 1, 1, None] * off_col[None, :, 1]
                )
            x = jnp.clip(to_int((px + ox) * pwf), 0, pw - 1)
            y = jnp.clip(to_int((py + oy) * phf), 0, ph - 1)
            return base + y * stride + x

        idx1 = pt(chunk["lmk1"][:, j], chunk["off1"][:, j])
        idx2 = pt(chunk["lmk2"][:, j], chunk["off2"][:, j])
        return idx1, idx2, jnp.broadcast_to(
            chunk["feat_th"][:, j][None, :], idx1.shape
        )

    bits = []  # descent decisions, MSB first
    for r in range(depth - 1):
        cands = [node_indices(j) for j in range((1 << r) - 1, (1 << (r + 1)) - 1)]
        idx1 = _bit_select([c[0] for c in cands], bits)
        idx2 = _bit_select([c[1] for c in cands], bits)
        th = _bit_select([c[2] for c in cands], bits)
        v = jnp.take(flat_img, idx1).astype(jnp.int32) - jnp.take(
            flat_img, idx2
        ).astype(jnp.int32)
        bits.append(v > th)

    leaves = sum(
        b.astype(jnp.int32) << (depth - 2 - i) for i, b in enumerate(bits)
    )
    ls = chunk["leaf_scores"]  # [C, leaf_n]
    leaf_planes = [
        jnp.broadcast_to(ls[:, j][None, :], leaves.shape)
        for j in range(1 << (depth - 1))
    ]
    b = _bit_select(leaf_planes, bits)
    return leaves, b


def score_chain(
    b: jnp.ndarray,  # [N, C] per-cart leaf score contributions
    chunk: Dict[str, jnp.ndarray],
    score: jnp.ndarray,  # [N]
    alive: jnp.ndarray,  # [N]
    nvis: jnp.ndarray,  # [N]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sequential score/threshold chain, exact reference op order
    (c/jda.c:395-399): score += leaf; score = (score-mean)/std; reject if
    score < th.  C steps of [N]-element adds — cheap next to the descent,
    and bit-identical to the per-window sequential evaluation."""

    def body(carry, xs):
        s, al, nv = carry
        bk, mk, sk, thk = xs
        s_new = (s + bk - mk) / sk
        s = jnp.where(al, s_new, s)
        nv = nv + al.astype(jnp.int32)
        al = al & (s >= thk)
        return (s, al, nv), None

    xs = (b.T, chunk["mean"], chunk["std"], chunk["cart_th"])
    (score, alive, nvis), _ = jax.lax.scan(body, (score, alive, nvis), xs)
    return score, alive, nvis


def run_cart_chunk(
    chunk: Dict[str, jnp.ndarray],
    flat_img: jnp.ndarray,
    state: Dict[str, jnp.ndarray],
    *,
    depth: int,
    rounding: bool,
    single_scale: bool = False,
    stp: Optional[jnp.ndarray] = None,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Run a contiguous run of carts (no regression at the end).

    chunk fields are stacked [C, ...]; returns (state, leaves [N, C] int32).
    Wide parallel descent + sequential score chain (see carts_descend).
    """
    leaves, b = carts_descend(
        chunk,
        flat_img,
        state,
        depth=depth,
        rounding=rounding,
        single_scale=single_scale,
        stp=stp,
    )
    score, alive, nvis = score_chain(
        b, chunk, state["score"], state["alive"], state["nvis"]
    )
    out = dict(state)
    out["score"], out["alive"], out["nvis"] = score, alive, nvis
    return out, leaves


def apply_regression(
    W_t: jnp.ndarray,  # [K*leaf_n, 2L]
    leaves: jnp.ndarray,  # [N, K]
    state: Dict[str, jnp.ndarray],
    *,
    leaf_n: int,
    exact: bool = True,
    stp: Optional[jnp.ndarray] = None,  # [N, 2, 2] similarity (mean->current)
) -> Dict[str, jnp.ndarray]:
    """Per-stage shape update from local binary features.

    exact=True replays the reference's arithmetic bit-for-bit: the K weight
    rows are added onto the shape *sequentially* in float32
    (c/jda.c:403-411), which matters because downstream feature coordinates
    are truncated to ints — a tree-reduction sum can differ by ~1 ulp and
    flip a truncation boundary.  exact=False uses the MXU one-hot matmul
    (faster, ~1e-7 relative difference).

    stp applies the per-window similarity transform to the accumulated
    delta before the shape update (GenDeltaShape's stp_mc.Apply,
    btcart.cpp:407-424) — the reference sums the weight rows first, then
    rotates the summed delta, so exact mode accumulates the delta
    separately when stp is given.

    Only stage survivors receive the update (rejected windows stop moving,
    matching the reference's goto-next).
    """
    n, K = leaves.shape
    L2 = W_t.shape[-1]
    Wk = W_t.reshape(K, leaf_n, L2)
    if exact:
        def body(acc, xs):
            wk, leaf = xs  # wk [leaf_n, L2], leaf [N]
            return acc + wk[leaf], None

        init = state["shape"] if stp is None else jnp.zeros_like(state["shape"])
        delta, _ = jax.lax.scan(body, init, (Wk, leaves.T))
        if stp is None:
            new_shape = delta
        else:
            xy = delta.reshape(n, L2 // 2, 2)
            rot = jnp.einsum("nij,nlj->nli", stp, xy).reshape(n, L2)
            new_shape = state["shape"] + rot
    else:
        onehot = jax.nn.one_hot(leaves, leaf_n, dtype=W_t.dtype)  # [N, K, leaf_n]
        delta = jnp.einsum(
            "nkl,kld->nd", onehot, Wk, preferred_element_type=jnp.float32
        )
        if stp is not None:
            xy = delta.reshape(n, L2 // 2, 2)
            delta = jnp.einsum("nij,nlj->nli", stp, xy).reshape(n, L2)
        new_shape = state["shape"] + delta
    out = dict(state)
    out["shape"] = jnp.where(state["alive"][:, None], new_shape, state["shape"])
    return out


def stage_params(dev: Dict[str, jnp.ndarray], t) -> Dict[str, jnp.ndarray]:
    """Slice the SoA model to one stage's cart chunk (all K carts)."""
    return {
        "scale": dev["scale"][t],
        "lmk1": dev["lmk1"][t],
        "lmk2": dev["lmk2"][t],
        "off1": dev["off1"][t],
        "off2": dev["off2"][t],
        "feat_th": dev["feat_th"][t],
        "leaf_scores": dev["leaf_scores"][t],
        "cart_th": dev["cart_th"][t],
        "mean": dev["mean"][t],
        "std": dev["std"][t],
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth",
        "rounding",
        "leaf_n",
        "T",
        "exact",
        "single_scale",
        "with_stp",
    ),
)
def cascade_full(
    dev: Dict[str, jnp.ndarray],
    flat_img: jnp.ndarray,
    state: Dict[str, jnp.ndarray],
    *,
    depth: int,
    rounding: bool,
    leaf_n: int,
    T: int,
    exact: bool = True,
    single_scale: bool = False,
    with_stp: bool = False,
) -> Dict[str, jnp.ndarray]:
    """All T stages on one batch, no compaction (reference-faithful scoring).

    Host pipelines (Detector) instead run stage-by-stage with survivor
    compaction; this single-program variant backs tests, mining validation,
    and the graft entry point.

    with_stp reproduces Validate's per-stage similarity transform
    (cascador.cpp:180,196): recomputed from each window's current shape at
    stage entry, applied to feature offsets during descent and to the
    regression delta.  Off in both shipped configs.
    """
    for t in range(T):
        stp = (
            st_calc_dev(state["shape"], dev["mean_shape"]) if with_stp else None
        )
        sp = stage_params(dev, t)
        state, leaves = run_cart_chunk(
            sp,
            flat_img,
            state,
            depth=depth,
            rounding=rounding,
            single_scale=single_scale,
            stp=stp,
        )
        state = apply_regression(
            dev["W"][t], leaves, state, leaf_n=leaf_n, exact=exact, stp=stp
        )
    return state
