"""Dense stage-0 rejection filter: the cascade as shifted-image arithmetic.

At stage 0 every window's shape is the mean shape (c/jda.c:361; shift_size
is 0 at detection time, src/test.cpp:17,75), so for a fixed window size the
feature pixel offsets (xr, yr) = trunc((mean + offset) * win) are THE SAME
for every window.  A window at grid position (wx, wy) reads
img[wy + yr, wx + xr] — i.e. each (cart, node, point) is one *shifted crop*
of the image, and the whole stage-0 cascade over all windows of a scan
scale becomes dense elementwise arithmetic over shifted crops: zero
gathers, pure DMA + VPU.  This recovers (and beats) the reference's
early-exit economics: the full K-cart stage-0 filter costs less than the
old 64-cart gather prefilter, and >99% of windows die here on a trained
cascade.

Phase decomposition makes the strided window grid contiguous: with scan
step s, phases[a*s+b] = img[a::s, b::s], so the grid values of a crop at
offset (yr, xr) are one dynamic_slice of plane (yr%s)*s + (xr%s) at
(yr//s, xr//s).

Applicability: single-scale models (multi_scale=false — the shipped
reference config) on the C-API detect path (truncation semantics).
Multi-scale or C++-rounding paths fall back to the gather kernel.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from jda_tpu.ops.cascade import _bit_select


def node_tables(
    mean_shape_f32: np.ndarray,  # [2L] float32 (must match device dtype)
    stage: Dict[str, np.ndarray],  # host stage-0 params (f32/int32)
    win: int,
    step: int,
    rounding: bool = False,
) -> Dict[str, np.ndarray]:
    """Host-side per-(cart, node, point) crop table for one scan scale.

    Reproduces the reference coordinate arithmetic exactly: float32
    (mean + offset) * win; trunc toward zero (C path, c/jda.c:375-381) or
    round half away from zero (C++ path, data.cpp:48-51); clamp to
    [0, win-1].
    """
    ms_x = mean_shape_f32[0::2].astype(np.float32)
    ms_y = mean_shape_f32[1::2].astype(np.float32)
    w32 = np.float32(win)

    def to_int(v):
        if rounding:
            return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(
                np.int32
            )
        return v.astype(np.int32)

    def point(lmk, off):
        # lmk [C, 7] int32; off [C, 7, 2] float32
        px = ms_x[lmk] + off[..., 0].astype(np.float32)
        py = ms_y[lmk] + off[..., 1].astype(np.float32)
        xr = np.clip(to_int(px * w32), 0, win - 1)
        yr = np.clip(to_int(py * w32), 0, win - 1)
        pi = (yr % step) * step + (xr % step)
        return pi.astype(np.int32), (yr // step).astype(np.int32), (
            xr // step
        ).astype(np.int32)

    pi1, u1, v1 = point(stage["lmk1"], stage["off1"])
    pi2, u2, v2 = point(stage["lmk2"], stage["off2"])
    return {
        "pi1": pi1, "u1": u1, "v1": v1,
        "pi2": pi2, "u2": u2, "v2": v2,
        "th": stage["feat_th"].astype(np.int32),
        "ls": stage["leaf_scores"].astype(np.float32),
        "mean": stage["mean"].astype(np.float32),
        "std": stage["std"].astype(np.float32),
        "cth": stage["cart_th"].astype(np.float32),
    }


def node_tables_ms(
    mean_shape_f32: np.ndarray,  # [2L] float32
    stage: Dict[str, np.ndarray],  # host stage-0 params incl. "scale"
    win: int,
    step: int,
    sizes: Tuple[int, int, int],  # (img_o_size, img_h_size, img_q_size)
    rounding: bool = True,
) -> Dict[str, np.ndarray]:
    """Multi-scale crop tables for the dense stage-0 filter (C++ method-0
    semantics, cascador.cpp:216-262): every window is a win x win crop of
    the scan level, per-window resized to the o/h/q patch sizes with
    cv::resize INTER_LINEAR, and feature pixels are read from the resized
    patch at clip(to_int((mean + offset) * size_s), 0, size_s - 1).

    Because the resize ratio win -> size_s is fixed, each resized-patch
    pixel is a fixed-point 4-tap combination of window-crop pixels at
    offsets that are CONSTANT per (cart, node, point) — so the shifted-crop
    trick extends to multi-scale models: each point becomes 4 phase-plane
    crops plus OpenCV's exact integer combine (ops/resize.cv_fixed_combine).
    Origin-scale points degenerate to identity taps (size_o == win in the
    method-0 scan), costing 4 identical crops — the uniform shape keeps the
    scan body static.

    Table layout per point p in {1, 2}: pi{p}/u{p}/v{p} [C, node_n, 4]
    (crop order r0c0, r0c1, r1c0, r1c1), ax0_{p}/ax1_{p}/by0_{p}/by1_{p}
    [C, node_n] int32 (coefficient scale 2^11)."""
    from jda_tpu.ops.resize import cv_linear_taps_fixed

    ms_x = mean_shape_f32[0::2].astype(np.float32)
    ms_y = mean_shape_f32[1::2].astype(np.float32)
    scale_arr = np.asarray(stage["scale"], np.int32)  # [C, node_n]
    sizes = tuple(int(s) for s in sizes)
    size_of = np.asarray(sizes, np.int32)[scale_arr]  # [C, node_n]
    msz = max(sizes)
    # padded per-scale tap LUTs [3, msz]
    lut_s0 = np.zeros((3, msz), np.int32)
    lut_s1 = np.zeros((3, msz), np.int32)
    lut_c0 = np.zeros((3, msz), np.int32)
    lut_c1 = np.zeros((3, msz), np.int32)
    for s, sz in enumerate(sizes):
        s0, s1, c0, c1 = cv_linear_taps_fixed(win, sz)
        lut_s0[s, :sz], lut_s1[s, :sz] = s0, s1
        lut_c0[s, :sz], lut_c1[s, :sz] = c0, c1

    def to_int(v):
        if rounding:
            return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(
                np.int32
            )
        return v.astype(np.int32)

    out: Dict[str, np.ndarray] = {}
    for p, (lmk, off) in enumerate(
        ((stage["lmk1"], stage["off1"]), (stage["lmk2"], stage["off2"])), 1
    ):
        px = ms_x[lmk] + off[..., 0].astype(np.float32)
        py = ms_y[lmk] + off[..., 1].astype(np.float32)
        szf = size_of.astype(np.float32)
        xr = np.clip(to_int(px * szf), 0, size_of - 1)
        yr = np.clip(to_int(py * szf), 0, size_of - 1)
        c0 = lut_s0[scale_arr, xr]
        c1 = lut_s1[scale_arr, xr]
        r0 = lut_s0[scale_arr, yr]
        r1 = lut_s1[scale_arr, yr]
        ys = np.stack([r0, r0, r1, r1], -1)  # [C, node_n, 4] src rows
        xs = np.stack([c0, c1, c0, c1], -1)  # src cols
        out[f"pi{p}"] = ((ys % step) * step + (xs % step)).astype(np.int32)
        out[f"u{p}"] = (ys // step).astype(np.int32)
        out[f"v{p}"] = (xs // step).astype(np.int32)
        out[f"ax0_{p}"] = lut_c0[scale_arr, xr]
        out[f"ax1_{p}"] = lut_c1[scale_arr, xr]
        out[f"by0_{p}"] = lut_c0[scale_arr, yr]
        out[f"by1_{p}"] = lut_c1[scale_arr, yr]
    out.update(
        th=np.asarray(stage["feat_th"], np.int32),
        ls=np.asarray(stage["leaf_scores"], np.float32),
        mean=np.asarray(stage["mean"], np.float32),
        std=np.asarray(stage["std"], np.float32),
        cth=np.asarray(stage["cart_th"], np.float32),
    )
    return out


def shift_tables(
    tab: Dict[str, np.ndarray], y0: int, x0: int, step: int
) -> Dict[str, np.ndarray]:
    """Shift a node table to a window-grid origin (y0, x0) on the canvas.

    Both must be multiples of step: window (iy, ix) of the shifted grid
    sits at (y0 + iy*step, x0 + ix*step), and because y0 % step == 0 the
    phase index is unchanged while the plane row/col offsets translate by
    (y0/step, x0/step).  Lets one canvas carry several banded window grids
    (packed method-0 pyramids, 1080p row bands)."""
    assert y0 % step == 0 and x0 % step == 0, (y0, x0, step)
    out = dict(tab)
    out["u1"] = tab["u1"] + y0 // step
    out["u2"] = tab["u2"] + y0 // step
    out["v1"] = tab["v1"] + x0 // step
    out["v2"] = tab["v2"] + x0 // step
    return out


def _phase_decompose(
    img: jnp.ndarray, s: int, hp: int = 0, wp: int = 0
) -> jnp.ndarray:
    """[B, H, W] -> [B, s*s, Hp, Wp] phase planes (Hp >= ceil(H/s))."""
    B, H, W = img.shape
    Hp = max(-(-H // s), hp)
    Wp = max(-(-W // s), wp)
    pad = jnp.pad(img, ((0, 0), (0, Hp * s - H), (0, Wp * s - W)))
    return (
        pad.reshape(B, Hp, s, Wp, s)
        .transpose(0, 2, 4, 1, 3)
        .reshape(B, s * s, Hp, Wp)
    )


# Carts per scan iteration.  The XLA scan pays a roughly fixed per-
# iteration cost (kernel launches + crop DMAs that don't overlap across
# iterations), so fewer, fatter iterations win until the unrolled body's
# compile time / VMEM bites (A/B via scripts/profile_detect.py).
import os as _os

CART_BLOCK = int(_os.environ.get("JDA_TPU_CART_BLOCK", "12"))

# Phase-plane storage dtype.  The filter is HBM-bandwidth bound on its
# 540 x 7 x 2 crop reads per scale (measured: CART_BLOCK made no
# difference, per-crop time tracks bytes at ~350 GB/s), so narrower
# planes cut the wall proportionally: pixels are u8, diffs fit in i16,
# and the compare/score chain still runs in f32/i32 registers.
_PLANE_DTYPES = {"i32": jnp.int32, "i16": jnp.int16, "u8": jnp.uint8}
PLANE_DTYPE = _PLANE_DTYPES[_os.environ.get("JDA_TPU_DENSE_DTYPE", "i32")]


# Stage-0 LBF emission: 4 bits per cart (leaf index 0..7 for depth-4
# trees), 8 carts per int32 word, cart k in word k//8 at nibble k%8.
# Lets the fused survivor tail skip the stage-0 re-descent entirely
# (540 carts x 3 nodes x 2 pixel gathers per lane) and jump straight to
# the stage-0 regression — the leaf indices already exist inside the
# dense filter as descent path bits.
LBF_BITS = 4
LBF_PER_WORD = 32 // LBF_BITS


def lbf_words(K: int) -> int:
    return -(-K // LBF_PER_WORD)


def _leaf_plane(bits):
    """Descent bits (MSB first, bool planes) -> leaf index plane (i32)."""
    d = len(bits)
    out = None
    for i, b in enumerate(bits):
        v = b.astype(jnp.int32) << (d - 1 - i)
        out = v if out is None else out + v
    return out


def _pack_leaf_block(leaf_planes):
    """Pack a block of per-cart leaf planes (len multiple of 8) into
    int32 words stacked on a trailing axis: [..., len/8]."""
    words = []
    for w0 in range(0, len(leaf_planes), LBF_PER_WORD):
        acc = None
        for i in range(LBF_PER_WORD):
            v = leaf_planes[w0 + i] << (LBF_BITS * i)
            acc = v if acc is None else acc | v
        words.append(acc)
    return jnp.stack(words, axis=-1)


def _scale_filter(img, tabs, *, step, ny, nx, depth, emit_lbf=False):
    """One scan scale: returns (score, alive, nvis), each [B, ny, nx];
    with emit_lbf also packed leaf words [B, ny, nx, lbf_words(K)].

    The scan is blocked CART_BLOCK carts per iteration: crop slices of a
    whole block issue together (independent DMAs overlap) while the score
    chain stays sequential within the block — ~CART_BLOCK x fewer loop
    iterations for the same arithmetic.
    """
    B = img.shape[0]
    ph = _phase_decompose(img, step).astype(PLANE_DTYPE)
    node_n = (1 << (depth - 1)) - 1
    K = tabs["th"].shape[0]

    # lbf packing needs word-aligned blocks (8 carts per i32 word)
    cb = 8 * -(-CART_BLOCK // 8) if emit_lbf else CART_BLOCK

    # pad cart count to a block multiple with never-rejecting no-ops
    # (zero leaf scores, mean 0, std 1, threshold -inf); the "real" flag
    # keeps pad carts out of the nvis telemetry
    tabs = dict(tabs)
    tabs["real"] = jnp.ones((K,), jnp.int32)
    kpad = (-K) % cb
    if kpad:
        def padtab(k, v):
            fill = 1.0 if k == "std" else (-jnp.inf if k == "cth" else 0)
            return jnp.pad(
                v,
                [(0, kpad)] + [(0, 0)] * (v.ndim - 1),
                constant_values=fill,
            )

        tabs = {k: padtab(k, jnp.asarray(v)) for k, v in tabs.items()}
    blocked = {
        k: jnp.asarray(v).reshape((-1, cb) + jnp.asarray(v).shape[1:])
        for k, v in tabs.items()
    }

    def body(carry, xb):
        s, alive, nvis = carry
        block_leaves = []
        for ci in range(cb):
            x = {k: v[ci] for k, v in xb.items()}

            def val(j):
                p1 = jax.lax.dynamic_slice(
                    ph, (0, x["pi1"][j], x["u1"][j], x["v1"][j]), (B, 1, ny, nx)
                )[:, 0]
                p2 = jax.lax.dynamic_slice(
                    ph, (0, x["pi2"][j], x["u2"][j], x["v2"][j]), (B, 1, ny, nx)
                )[:, 0]
                # widen AFTER the crop lands: the HBM read rides the
                # narrow plane dtype, the subtract runs in i32 registers
                return p1.astype(jnp.int32) - p2.astype(jnp.int32)

            vals = [val(j) for j in range(node_n)]
            bits = []
            for r in range(depth - 1):
                planes = [
                    vals[j] > x["th"][j]
                    for j in range((1 << r) - 1, (1 << (r + 1)) - 1)
                ]
                bits.append(_bit_select(planes, bits))
            leaf_planes = [
                jnp.broadcast_to(x["ls"][j], s.shape)
                for j in range(node_n + 1)
            ]
            b = _bit_select(leaf_planes, bits)
            if emit_lbf:
                block_leaves.append(_leaf_plane(bits))

            s_new = (s + b - x["mean"]) / x["std"]
            s = jnp.where(alive, s_new, s)
            nvis = nvis + alive.astype(jnp.int32) * x["real"]
            alive = alive & (s >= x["cth"])
        ys = _pack_leaf_block(block_leaves) if emit_lbf else None
        return (s, alive, nvis), ys

    init = (
        jnp.zeros((B, ny, nx), jnp.float32),
        jnp.ones((B, ny, nx), bool),
        jnp.zeros((B, ny, nx), jnp.int32),
    )
    (score, alive, nvis), ys = jax.lax.scan(body, init, blocked)
    if not emit_lbf:
        return score, alive, nvis
    # ys [nblk, B, ny, nx, cb/8] -> [B, ny, nx, NW]
    lbf = jnp.moveaxis(ys, 0, 3).reshape(B, ny, nx, -1)[..., : lbf_words(K)]
    return score, alive, nvis, lbf


def _scale_filter_ms(img, tabs, *, step, ny, nx, depth, emit_lbf=False):
    """Multi-scale variant of _scale_filter: each node point is 4 shifted
    crops combined with OpenCV's exact fixed-point bilinear arithmetic
    (node_tables_ms).  Same blocking/score-chain structure; XLA scan only
    (the Pallas kernels stay single-scale)."""
    from jda_tpu.ops.resize import cv_fixed_combine

    B = img.shape[0]
    ph = _phase_decompose(img, step).astype(PLANE_DTYPE)
    node_n = (1 << (depth - 1)) - 1
    K = tabs["th"].shape[0]
    cb = 8 * -(-CART_BLOCK // 8) if emit_lbf else CART_BLOCK

    tabs = dict(tabs)
    tabs["real"] = jnp.ones((K,), jnp.int32)
    kpad = (-K) % cb
    if kpad:
        def padtab(k, v):
            fill = 1.0 if k == "std" else (-jnp.inf if k == "cth" else 0)
            return jnp.pad(
                v,
                [(0, kpad)] + [(0, 0)] * (v.ndim - 1),
                constant_values=fill,
            )

        tabs = {k: padtab(k, jnp.asarray(v)) for k, v in tabs.items()}
    blocked = {
        k: jnp.asarray(v).reshape((-1, cb) + jnp.asarray(v).shape[1:])
        for k, v in tabs.items()
    }

    def body(carry, xb):
        s, alive, nvis = carry
        block_leaves = []
        for ci in range(cb):
            x = {k: v[ci] for k, v in xb.items()}

            def pix(j, p):
                crops = []
                for t in range(4):
                    cpl = jax.lax.dynamic_slice(
                        ph,
                        (
                            0,
                            x[f"pi{p}"][j, t],
                            x[f"u{p}"][j, t],
                            x[f"v{p}"][j, t],
                        ),
                        (B, 1, ny, nx),
                    )[:, 0].astype(jnp.int32)
                    crops.append(cpl)
                t0 = x[f"ax0_{p}"][j] * crops[0] + x[f"ax1_{p}"][j] * crops[1]
                t1 = x[f"ax0_{p}"][j] * crops[2] + x[f"ax1_{p}"][j] * crops[3]
                return cv_fixed_combine(t0, t1, x[f"by0_{p}"][j], x[f"by1_{p}"][j])

            vals = [pix(j, 1) - pix(j, 2) for j in range(node_n)]
            bits = []
            for r in range(depth - 1):
                planes = [
                    vals[j] > x["th"][j]
                    for j in range((1 << r) - 1, (1 << (r + 1)) - 1)
                ]
                bits.append(_bit_select(planes, bits))
            leaf_planes = [
                jnp.broadcast_to(x["ls"][j], s.shape)
                for j in range(node_n + 1)
            ]
            b = _bit_select(leaf_planes, bits)
            if emit_lbf:
                block_leaves.append(_leaf_plane(bits))

            s_new = (s + b - x["mean"]) / x["std"]
            s = jnp.where(alive, s_new, s)
            nvis = nvis + alive.astype(jnp.int32) * x["real"]
            alive = alive & (s >= x["cth"])
        ys = _pack_leaf_block(block_leaves) if emit_lbf else None
        return (s, alive, nvis), ys

    init = (
        jnp.zeros((B, ny, nx), jnp.float32),
        jnp.ones((B, ny, nx), bool),
        jnp.zeros((B, ny, nx), jnp.int32),
    )
    (score, alive, nvis), ys = jax.lax.scan(body, init, blocked)
    if not emit_lbf:
        return score, alive, nvis
    lbf = jnp.moveaxis(ys, 0, 3).reshape(B, ny, nx, -1)[..., : lbf_words(K)]
    return score, alive, nvis, lbf


@functools.partial(jax.jit, static_argnames=("meta", "depth", "emit_lbf"))
def stage0_filter_all_scales_ms(
    img: jnp.ndarray,  # [B, H, W] int32
    tabs: Tuple[Dict[str, jnp.ndarray], ...],  # node_tables_ms per scale
    *,
    meta: Tuple[Tuple[int, int, int, int], ...],  # (win, step, ny, nx)
    depth: int,
    emit_lbf: bool = False,
):
    """stage0_filter_all_scales for multi-scale models (method-0 packed
    pyramids): one program over every scan grid, _scale_filter_ms bodies."""
    scores, alives, nviss, lbfs = [], [], [], []
    B = img.shape[0]
    for (win, step, ny, nx), tab in zip(meta, tabs):
        out = _scale_filter_ms(
            img, tab, step=step, ny=ny, nx=nx, depth=depth, emit_lbf=emit_lbf
        )
        s, a, nv = out[:3]
        scores.append(s.reshape(B, ny * nx))
        alives.append(a.reshape(B, ny * nx))
        nviss.append(nv.reshape(B, ny * nx))
        if emit_lbf:
            lbfs.append(out[3].reshape(B, ny * nx, -1))
    res = (
        jnp.concatenate(scores, axis=1),
        jnp.concatenate(alives, axis=1),
        jnp.concatenate(nviss, axis=1),
    )
    if emit_lbf:
        return res + (jnp.concatenate(lbfs, axis=1),)
    return res


# windows per grid under which the static-slice filter applies (small
# grids are latency-bound: every dynamic_slice is an unfusable ~4 us
# kernel, so 540 x 14 of them cost ~30 ms per scale no matter how tiny
# the tensors are — measured in scripts/profile_dense2.py)
STATIC_MAX_WINDOWS = int(_os.environ.get("JDA_TPU_DENSE_STATIC_MAX", "2500"))


def _scale_filter_static(
    img, tab_dev, tab_host, *, step, ny, nx, depth, emit_lbf=False
):
    """Small-grid scales: pre-gather every tap's grid in ONE constant-
    index gather, then run the cart chain as pure elementwise scan work.

    A dynamic_slice with traced starts cannot fuse into the consumer on
    XLA:TPU — each is a standalone ~4 us kernel, and the 7 small scales
    of a VGA ladder pay 7 x 540 x 14 of them (~200 ms for 2k windows,
    scripts/profile_dense2.py).  The crop coordinates are host data
    (node_tables output), so all K*14 taps become one vmap'd
    dynamic_slice over a CONSTANT index table — a single XLA gather of
    [B, 1, ny, nx] blocks — and the tree/score chain consumes the
    materialized diffs with zero per-iteration HBM slicing.  Arithmetic
    is bit-identical to _scale_filter (same int32 diffs, same f32 score
    chain order)."""
    B = img.shape[0]
    node_n = (1 << (depth - 1)) - 1
    K = int(tab_host["th"].shape[0])
    ph = _phase_decompose(img, step)

    taps = np.stack(
        [
            np.stack(
                [tab_host["pi1"], tab_host["u1"], tab_host["v1"]], axis=-1
            ),
            np.stack(
                [tab_host["pi2"], tab_host["u2"], tab_host["v2"]], axis=-1
            ),
        ],
        axis=2,
    )  # [K, node_n, 2, 3]
    flat = jnp.asarray(taps.reshape(-1, 3).astype(np.int32))

    def one(sidx):
        return jax.lax.dynamic_slice(
            ph, (0, sidx[0], sidx[1], sidx[2]), (B, 1, ny, nx)
        )[:, 0]

    vals = jax.vmap(one)(flat).reshape(K, node_n, 2, B, ny, nx)
    diffs = vals[:, :, 0] - vals[:, :, 1]  # [K, node_n, B, ny, nx]

    kb = min(CART_BLOCK * 9, K)
    if emit_lbf:
        kb = 8 * -(-kb // 8)  # word-aligned blocks for lbf packing
    kpad = (-K) % kb

    def padk(a, fill):
        return (
            jnp.pad(
                a,
                [(0, kpad)] + [(0, 0)] * (a.ndim - 1),
                constant_values=fill,
            )
            if kpad
            else a
        )

    xs = {
        "d": padk(diffs, 0).reshape((-1, kb) + diffs.shape[1:]),
        "th": padk(tab_dev["th"], 0).reshape(-1, kb, node_n),
        "ls": padk(tab_dev["ls"], 0.0).reshape(-1, kb, node_n + 1),
        "mean": padk(tab_dev["mean"], 0.0).reshape(-1, kb),
        "std": padk(tab_dev["std"], 1.0).reshape(-1, kb),
        "cth": padk(tab_dev["cth"], -jnp.inf).reshape(-1, kb),
        "real": padk(jnp.ones((K,), jnp.int32), 0).reshape(-1, kb),
    }

    def body(carry, xb):
        s, alive, nvis = carry
        block_leaves = []
        for ci in range(kb):
            vals_c = xb["d"][ci]  # [node_n, B, ny, nx]
            bits = []
            for r in range(depth - 1):
                planes = [
                    vals_c[j] > xb["th"][ci, j]
                    for j in range((1 << r) - 1, (1 << (r + 1)) - 1)
                ]
                bits.append(_bit_select(planes, bits))
            leaf_planes = [
                jnp.broadcast_to(xb["ls"][ci, j], s.shape)
                for j in range(node_n + 1)
            ]
            b = _bit_select(leaf_planes, bits)
            if emit_lbf:
                block_leaves.append(_leaf_plane(bits))
            s_new = (s + b - xb["mean"][ci]) / xb["std"][ci]
            s = jnp.where(alive, s_new, s)
            nvis = nvis + alive.astype(jnp.int32) * xb["real"][ci]
            alive = alive & (s >= xb["cth"][ci])
        ys = _pack_leaf_block(block_leaves) if emit_lbf else None
        return (s, alive, nvis), ys

    init = (
        jnp.zeros((B, ny, nx), jnp.float32),
        jnp.ones((B, ny, nx), bool),
        jnp.zeros((B, ny, nx), jnp.int32),
    )
    (score, alive, nvis), ys = jax.lax.scan(body, init, xs)
    if not emit_lbf:
        return score, alive, nvis
    lbf = jnp.moveaxis(ys, 0, 3).reshape(B, ny, nx, -1)[..., : lbf_words(K)]
    return score, alive, nvis, lbf


# ---------------------------------------------------------------------------
# Pallas kernel: the whole per-scale stage-0 with phase planes resident in
# VMEM.  The XLA scan above pays a per-iteration HBM DMA for every crop
# (540 carts x 14 crops x 14 scales); here crops are VMEM vector loads, so
# the filter is VPU-bound.  Grid = one step per cart, executed in order;
# score/alive/nvis live in constant-index output blocks (VMEM) across steps.
# ---------------------------------------------------------------------------

def _scale_filter_pallas(
    img2d: jnp.ndarray, tabi, tabf, *, win, step, ny, nx, depth
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic DMA slices must be tile-aligned in BOTH shape and offset for
    # the last two dims (8 sublanes x 128 lanes).  Shapes: pad the crop to
    # (ny8 + 8, nx128 + 128).  Offsets: row start rounded down to a multiple
    # of 8 (pl.multiple_of proves it), lane start is always 0 because the
    # crop offset v <= (win-1)//step < 128.  The residual (row in [0,8),
    # lane in [0, umax]) is applied with lax.switch over static in-register
    # slices after the copy lands in VMEM.
    ny8 = -(-ny // 8) * 8
    nx128 = -(-nx // 128) * 128
    umax = (win - 1) // step
    NYB = ny8 + 8
    NXB = nx128 + 128
    ph = _phase_decompose(img2d[None], step, hp=umax // 8 * 8 + NYB, wp=NXB)[
        0
    ]  # [s*s, Hp, Wp]
    K = tabi.shape[0]
    node_n = (1 << (depth - 1)) - 1
    n_pts = 2 * node_n
    ny_out, nx_out = ny, nx
    ny, nx = ny8, nx128  # kernel computes on the padded grid

    def kernel(tabi_ref, tabf_ref, ph_ref, score_ref, alive_ref, nvis_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            score_ref[:] = jnp.zeros((ny, nx), jnp.float32)
            alive_ref[:] = jnp.ones((ny, nx), jnp.int32)
            nvis_ref[:] = jnp.zeros((ny, nx), jnp.int32)

        def body(crops, sems):
            def start_point(j, p):
                o = 6 * j + 3 * p
                u = tabi_ref[k, o + 1]
                u_al = pl.multiple_of((u // 8) * 8, 8)
                pltpu.make_async_copy(
                    ph_ref.at[tabi_ref[k, o], pl.ds(u_al, NYB), pl.ds(0, NXB)],
                    crops.at[2 * j + p],
                    sems.at[2 * j + p],
                ).start()

            def crop_value(j, p):
                o = 6 * j + 3 * p
                u = tabi_ref[k, o + 1]
                v = tabi_ref[k, o + 2]
                pltpu.make_async_copy(
                    ph_ref.at[0, pl.ds(0, NYB), pl.ds(0, NXB)],
                    crops.at[2 * j + p],
                    sems.at[2 * j + p],
                ).wait()
                buf = crops[2 * j + p]
                ru = u - (u // 8) * 8
                rows = jax.lax.switch(
                    ru, [lambda r=r: buf[r : r + ny, :] for r in range(8)]
                )
                return jax.lax.switch(
                    v,
                    [lambda c=c: rows[:, c : c + nx] for c in range(umax + 1)],
                )

            # launch every crop copy up front; waits interleave with compute
            for j in range(node_n):
                for p in range(2):
                    start_point(j, p)

            def bit_sel(planes, bits_i32):
                if not bits_i32:
                    return planes[0]
                half = len(planes) // 2
                return jnp.where(
                    bits_i32[0] != 0,
                    bit_sel(planes[half:], bits_i32[1:]),
                    bit_sel(planes[:half], bits_i32[1:]),
                )

            bits = []  # int32 masks: Mosaic can't reload an i1/i8 mask
            for r in range(depth - 1):
                first = (1 << r) - 1
                planes = []
                for c in range(1 << r):
                    j = first + c
                    val = crop_value(j, 0) - crop_value(j, 1)
                    planes.append(
                        (val > tabi_ref[k, 6 * node_n + j]).astype(jnp.int32)
                    )
                bits.append(bit_sel(planes, bits))

            leaf_planes = [tabf_ref[k, j] for j in range(node_n + 1)]
            b = bit_sel(leaf_planes, bits)

            al = alive_ref[:] > 0
            s = score_ref[:]
            s_new = (s + b - tabf_ref[k, node_n + 1]) / tabf_ref[k, node_n + 2]
            s = jnp.where(al, s_new, s)
            score_ref[:] = s
            nvis_ref[:] = nvis_ref[:] + alive_ref[:]
            alive_ref[:] = jnp.where(al & (s >= tabf_ref[k, node_n + 3]), 1, 0)

        pl.run_scoped(
            body,
            crops=pltpu.VMEM((n_pts, NYB, NXB), jnp.int32),
            sems=pltpu.SemaphoreType.DMA((n_pts,)),
        )

    pl_out = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(tabi.shape, lambda k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(tabf.shape, lambda k: (0, 0), memory_space=pltpu.SMEM),
            # phases stay in HBM: tiled VMEM memrefs reject dynamic offsets
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((ny, nx), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, nx), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, nx), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((ny, nx), jnp.int32),  # alive (bool as i32)
            jax.ShapeDtypeStruct((ny, nx), jnp.int32),
        ],
    )(tabi, tabf, ph)
    return tuple(o[:ny_out, :nx_out] for o in pl_out)


def pack_tables(tab: Dict[str, np.ndarray], node_n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pack node_tables output into the kernel's SMEM rows:
    tabi [K, 6*node_n + node_n]: (pi1,u1,v1,pi2,u2,v2) per node, then th;
    tabf [K, leaf_n + 3]: leaf scores, mean, std, cart_th."""
    K = tab["th"].shape[0]
    ints = np.concatenate(
        [
            np.stack(
                [tab["pi1"], tab["u1"], tab["v1"], tab["pi2"], tab["u2"], tab["v2"]],
                axis=-1,
            ).reshape(K, 6 * node_n),
            tab["th"].reshape(K, node_n),
        ],
        axis=1,
    ).astype(np.int32)
    flts = np.concatenate(
        [
            tab["ls"],
            tab["mean"][:, None],
            tab["std"][:, None],
            tab["cth"][:, None],
        ],
        axis=1,
    ).astype(np.float32)
    return ints, flts


@functools.partial(jax.jit, static_argnames=("meta", "depth"))
def stage0_filter_all_scales_pallas(
    img2d: jnp.ndarray,  # [H, W] int32
    tabis: Tuple[jnp.ndarray, ...],
    tabfs: Tuple[jnp.ndarray, ...],
    *,
    meta: Tuple[Tuple[int, int, int, int], ...],
    depth: int,
):
    """All scan scales in one program; one pallas_call per scale.
    Returns flat (score, alive, nvis) in window enumeration order."""
    scores, alives, nviss = [], [], []
    for (win, step, ny, nx), ti, tf in zip(meta, tabis, tabfs):
        s, a, nv = _scale_filter_pallas(
            img2d, ti, tf, win=win, step=step, ny=ny, nx=nx, depth=depth
        )
        scores.append(s.reshape(ny * nx))
        alives.append((a != 0).reshape(ny * nx))
        nviss.append(nv.reshape(ny * nx))
    return (
        jnp.concatenate(scores),
        jnp.concatenate(alives),
        jnp.concatenate(nviss),
    )


# ---------------------------------------------------------------------------
# Pallas kernel v2: phase planes RESIDENT in VMEM, cart loop inside the
# kernel.  The round-1 kernel (above) re-DMA'd ~0.5 MB of phase data from HBM
# for every (cart, node, point) — 7560 copies per scale of the same ~1 MB of
# pixels.  Here the planes are loaded once per image (grid = batch), and each
# crop is two register-level shifts (an 8-way sublane switch and a ~12-way
# lane switch over static slices), so the filter runs at VMEM/VPU speed with
# zero HBM traffic inside the cart loop.  Scales whose phase planes exceed
# the VMEM budget (large scan steps: s^2 alignment padding blows up) fall
# back to the XLA scan — they carry ~1% of the windows.
# ---------------------------------------------------------------------------

_RESIDENT_VMEM_BUDGET = 6 * 1024 * 1024


def _resident_geom(H: int, W: int, win: int, step: int, ny: int, nx: int):
    """Phase-plane geometry for the resident kernel.

    Returns None when the planes cannot fit VMEM even column-tiled; else a
    geometry dict with ctile = None (whole plane resident) or the column
    tile width (planes stay in HBM; each grid step DMAs one aligned column
    slab into VMEM — the 1080p path, where the full plane is ~10 MB)."""
    s2 = step * step
    ny8 = -(-ny // 8) * 8
    nx128 = -(-nx // 128) * 128
    umax = (win - 1) // step
    NYB = ny8 + 8
    Hp = max(-(-H // step), (umax // 8) * 8 + NYB)
    Hp = -(-Hp // 8) * 8
    Wp = max(-(-W // step), umax + nx128)
    Wp = -(-Wp // 128) * 128
    geom = dict(
        s2=s2, ny8=ny8, nx128=nx128, umax=umax, NYB=NYB, Hp=Hp, Wp=Wp,
        ctile=None,
    )
    if s2 * Hp * Wp * 4 <= _RESIDENT_VMEM_BUDGET:
        return geom
    for nxt in (512, 256, 128):
        if nxt >= nx128:
            continue
        # whole working set must fit scoped VMEM (~16 MB): the DMA slab
        # plus ~12 [ny8, nxt] f32/i32 planes (3 outputs, 7 node values,
        # rolls/temps)
        slab = s2 * Hp * (nxt + 128) * 4
        planes = 12 * ny8 * nxt * 4
        if slab + planes <= 13 * 1024 * 1024:
            geom["ctile"] = nxt
            n_ct = -(-nx128 // nxt)
            # every tile's DMA slab [j*nxt, j*nxt + nxt + 128) must be in
            # range, including the rounded-up last tile
            geom["Wp"] = max(Wp, n_ct * nxt + 128)
            return geom
    return None


def _scale_filter_pallas_resident(
    img: jnp.ndarray,  # [B, H, W] int32
    tabi: jnp.ndarray,  # [K, 6*node_n + node_n] int32 (pack_tables)
    tabf: jnp.ndarray,  # [K, leaf_n + 3] float32
    *,
    step: int,
    ny: int,
    nx: int,
    depth: int,
    geom: dict,
    emit_lbf: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = img.shape[0]
    K = tabi.shape[0]
    node_n = (1 << (depth - 1)) - 1
    leaf_n = node_n + 1
    ny8, nx128 = geom["ny8"], geom["nx128"]
    umax, NYB = geom["umax"], geom["NYB"]
    Hp, Wp = geom["Hp"], geom["Wp"]
    s2 = geom["s2"]
    ph = _phase_decompose(img, step, hp=Hp, wp=Wp)  # [B, s2, Hp, Wp]
    NW = lbf_words(K)
    if emit_lbf:
        tabi, tabf = _pad_noop_carts(
            tabi, tabf, leaf_n, NW * LBF_PER_WORD - K
        )

    def kernel(tabi_ref, tabf_ref, ph_ref, score_ref, alive_ref, nvis_ref,
               *rest):
        def crop(k, o):
            # crop at (u, v) of plane pi: a tile-aligned VMEM read plus two
            # dynamic rotates (tpu DynamicRotateOp handles traced shifts;
            # lax.switch over slices would execute EVERY branch + select)
            pi = tabi_ref[k, o]
            u = tabi_ref[k, o + 1]
            v = tabi_ref[k, o + 2]
            u_al = pl.multiple_of((u // 8) * 8, 8)
            buf = ph_ref[0, pi, pl.ds(u_al, NYB), :]  # [NYB, Wp]
            ru = u - u_al
            rows = pltpu.roll(buf, (NYB - ru) % NYB, 0)[:ny8, :]
            return pltpu.roll(rows, (Wp - v) % Wp, 1)[:, :nx128]

        def bit_sel(planes, bits_i32):
            if not bits_i32:
                return planes[0]
            half = len(planes) // 2
            return jnp.where(
                bits_i32[0] != 0,
                bit_sel(planes[half:], bits_i32[1:]),
                bit_sel(planes[:half], bits_i32[1:]),
            )

        # loop state lives in the output refs (VMEM blocks): Mosaic cannot
        # reconcile splat-constant fori carries with computed layouts
        score_ref[0] = jnp.zeros((ny8, nx128), jnp.float32)
        alive_ref[0] = jnp.ones((ny8, nx128), jnp.int32)
        nvis_ref[0] = jnp.zeros((ny8, nx128), jnp.int32)

        def one_cart(k):
            s = score_ref[0]
            al = alive_ref[0]
            vals = [crop(k, 6 * j) - crop(k, 6 * j + 3) for j in range(node_n)]
            bits = []
            for r in range(depth - 1):
                planes = [
                    (vals[j] > tabi_ref[k, 6 * node_n + j]).astype(jnp.int32)
                    for j in range((1 << r) - 1, (1 << (r + 1)) - 1)
                ]
                bits.append(bit_sel(planes, bits))
            leaf_planes = [
                jnp.full((ny8, nx128), tabf_ref[k, j], jnp.float32)
                for j in range(leaf_n)
            ]
            b = bit_sel(leaf_planes, bits)
            alb = al != 0
            s_new = (s + b - tabf_ref[k, leaf_n]) / tabf_ref[k, leaf_n + 1]
            s = jnp.where(alb, s_new, s)
            score_ref[0] = s
            if emit_lbf:
                nvis_ref[0] = nvis_ref[0] + jnp.where(k < K, al, 0)
            else:
                nvis_ref[0] = nvis_ref[0] + al
            alive_ref[0] = jnp.where(
                alb & (s >= tabf_ref[k, leaf_n + 2]), 1, 0
            )
            leaf = None
            for i, bb in enumerate(bits):
                v = bb << (depth - 2 - i)
                leaf = v if leaf is None else leaf + v
            return leaf

        if emit_lbf:
            lbf_hbm, word, sem = rest
            bi = pl.program_id(0)

            def word_body(w, _):
                acc = None
                for i in range(LBF_PER_WORD):
                    v = one_cart(w * LBF_PER_WORD + i) << (LBF_BITS * i)
                    acc = v if acc is None else acc | v
                word[0] = acc
                cp = pltpu.make_async_copy(word.at[0], lbf_hbm.at[bi, w], sem)
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(0, NW, word_body, 0)
        else:
            def cart_body(k, _):
                one_cart(k)
                return 0

            jax.lax.fori_loop(0, K, cart_body, 0)

    out_specs = [
        pl.BlockSpec(
            (1, ny8, nx128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        for _ in range(3)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, ny8, nx128), jnp.float32),
        jax.ShapeDtypeStruct((B, ny8, nx128), jnp.int32),
        jax.ShapeDtypeStruct((B, ny8, nx128), jnp.int32),
    ]
    scratch = []
    if emit_lbf:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((B, NW, ny8, nx128), jnp.int32)
        )
        scratch = [
            pltpu.VMEM((1, ny8, nx128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                tabi.shape, lambda b: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                tabf.shape, lambda b: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, s2, Hp, Wp),
                lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(tabi, tabf, ph)
    score, alive, nvis = outs[:3]
    res = (
        score[:, :ny, :nx],
        alive[:, :ny, :nx] != 0,
        nvis[:, :ny, :nx],
    )
    if emit_lbf:
        res = res + (outs[3].transpose(0, 2, 3, 1)[:, :ny, :nx, :],)
    return res


# NOTE: if you pin JDA_TPU_DENSE_ROLLED_BUDGET externally, recalibrate —
# the cost model under this gate changed in round 3 (doubled input term +
# live-temps term) and again in round 4 (depth-dependent temps); stale
# pins calibrated against the old model behave over-conservatively.
_ROLLED_VMEM_BUDGET = int(
    _os.environ.get("JDA_TPU_DENSE_ROLLED_BUDGET", str(15_000_000))
)

# [ny8, nx128] i32/f32 planes the kernel keeps live BEYOND the per-node
# crop diffs and per-leaf one-hot planes: path bits, score/alive/nvis
# blocks and their double buffers.  Measured on the real chip for the
# depth-4 flagship geometry: 36 total live planes - 7 node diffs - 8 leaf
# planes = 21.  The 15 MB default budget additionally reserves ~1 MB of
# headroom below Mosaic's 16 MB scoped limit for unmodeled scratch (the
# emit_lbf word block, int8 rolled-scratch sublane padding to 32-row
# tiles) — keep that slack when bumping the budget.
_ROLLED_OVERHEAD_PLANES = 21


def _rolled_fits(geom: dict, depth: int = 4) -> bool:
    """Scoped-VMEM budget check for the pre-rolled-planes kernel.

    The working set Mosaic allocates on the kernel stack is NOT just the
    explicit scratch: it is (a) the grid-mapped input block,
    double-buffered across grid steps, (b) the s2*(umax+1) int8 rolled
    variants, and (c) the kernel's live [ny8, nx128] i32/f32 temporaries —
    per-node crop diffs + per-leaf one-hot planes + fixed overhead
    (_ROLLED_OVERHEAD_PLANES), 36 planes measured at depth 4 on the real
    chip (the VGA win=24 scale blew the 16 MB scoped limit by 1.7 MB
    while the old inp+scratch model predicted 4.9 MB).  Scales over
    budget fall back to _scale_filter_pallas_resident, which holds fewer
    planes live because crops are rolled on demand."""
    s2, Hp, Wp = geom["s2"], geom["Hp"], geom["Wp"]
    node_n = (1 << (depth - 1)) - 1
    leaf_n = 1 << (depth - 1)
    inp = 2 * s2 * Hp * Wp * 4
    scratch = s2 * (geom["umax"] + 1) * Hp * Wp
    planes = node_n + leaf_n + _ROLLED_OVERHEAD_PLANES
    temps = planes * geom["ny8"] * geom["nx128"] * 4
    return inp + scratch + temps <= _ROLLED_VMEM_BUDGET


def _pad_noop_carts(tabi, tabf, leaf_n, kpad):
    """Append kpad never-rejecting no-op carts (zero leaf scores, mean 0,
    std 1, cart_th -inf, all crop coords 0) to packed SMEM tables."""
    if not kpad:
        return tabi, tabf
    tabi = jnp.pad(tabi, ((0, kpad), (0, 0)))
    pad_row = jnp.concatenate(
        [
            jnp.zeros(leaf_n + 1, jnp.float32),  # leaf scores + mean
            jnp.ones(1, jnp.float32),  # std
            jnp.full(1, -jnp.inf, jnp.float32),  # cart_th
        ]
    )
    tabf = jnp.concatenate(
        [tabf, jnp.broadcast_to(pad_row, (kpad, tabf.shape[1]))]
    )
    return tabi, tabf


def _scale_filter_pallas_rolled(
    img: jnp.ndarray,  # [B, H, W] int32
    tabi: jnp.ndarray,
    tabf: jnp.ndarray,
    *,
    step: int,
    ny: int,
    nx: int,
    depth: int,
    geom: dict,
    emit_lbf: bool = False,
):
    """Resident kernel with PRE-LANE-ROLLED int8 phase planes.

    The plain resident kernel pays a dynamic 2D roll per crop — the lane
    rotate alone lowers to a multi-stage select ladder across 128 lanes,
    and 540 carts x 14 crops of it dominate the dense wall (win24 scale:
    ~110 ms device, scripts/profile_dense2.py).  Lane shifts are bounded
    by umax = (win-1)//step < 128, so ALL s2*(umax+1) lane rotations are
    precomputed ONCE per image with STATIC shifts into an int8 VMEM
    scratch (pixels biased by -128 to fit int8; pixel DIFFERENCES are
    unchanged, and thresholds compare diffs only).  Each crop is then a
    dynamic plane-index read plus a cheap dynamic SUBLANE-only roll."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = img.shape[0]
    K = tabi.shape[0]
    node_n = (1 << (depth - 1)) - 1
    leaf_n = node_n + 1
    ny8, nx128 = geom["ny8"], geom["nx128"]
    umax, NYB = geom["umax"], geom["NYB"]
    Hp, Wp = geom["Hp"], geom["Wp"]
    s2 = geom["s2"]
    NV = umax + 1
    ph = _phase_decompose(img, step, hp=Hp, wp=Wp)  # [B, s2, Hp, Wp]
    NW = lbf_words(K)
    if emit_lbf:
        tabi, tabf = _pad_noop_carts(
            tabi, tabf, leaf_n, NW * LBF_PER_WORD - K
        )

    def kernel(tabi_ref, tabf_ref, ph_ref, score_ref, alive_ref, nvis_ref,
               *rest):
        if emit_lbf:
            lbf_hbm, rolled, word, sem = rest
        else:
            (rolled,) = rest
        # -- static lane rotations, once per image --------------------
        for pi in range(s2):
            plane = ph_ref[0, pi]  # [Hp, Wp] int32
            for v in range(NV):
                sh = pltpu.roll(plane, (Wp - v) % Wp, 1) if v else plane
                rolled[pi * NV + v] = (sh - 128).astype(jnp.int8)

        def crop(k, o):
            pi = tabi_ref[k, o]
            u = tabi_ref[k, o + 1]
            v = tabi_ref[k, o + 2]
            u_al = pl.multiple_of((u // 8) * 8, 8)
            buf = rolled[
                pi * NV + v, pl.ds(u_al, NYB), :nx128
            ].astype(jnp.int32)
            ru = u - u_al
            return pltpu.roll(buf, (NYB - ru) % NYB, 0)[:ny8, :]

        def bit_sel(planes, bits_i32):
            if not bits_i32:
                return planes[0]
            half = len(planes) // 2
            return jnp.where(
                bits_i32[0] != 0,
                bit_sel(planes[half:], bits_i32[1:]),
                bit_sel(planes[:half], bits_i32[1:]),
            )

        score_ref[0] = jnp.zeros((ny8, nx128), jnp.float32)
        alive_ref[0] = jnp.ones((ny8, nx128), jnp.int32)
        nvis_ref[0] = jnp.zeros((ny8, nx128), jnp.int32)

        def one_cart(k):
            """Score/alive/nvis update for cart k; returns the leaf plane."""
            s = score_ref[0]
            al = alive_ref[0]
            vals = [crop(k, 6 * j) - crop(k, 6 * j + 3) for j in range(node_n)]
            bits = []
            for r in range(depth - 1):
                planes = [
                    (vals[j] > tabi_ref[k, 6 * node_n + j]).astype(jnp.int32)
                    for j in range((1 << r) - 1, (1 << (r + 1)) - 1)
                ]
                bits.append(bit_sel(planes, bits))
            leaf_planes = [
                jnp.full((ny8, nx128), tabf_ref[k, j], jnp.float32)
                for j in range(leaf_n)
            ]
            b = bit_sel(leaf_planes, bits)
            alb = al != 0
            s_new = (s + b - tabf_ref[k, leaf_n]) / tabf_ref[k, leaf_n + 1]
            s = jnp.where(alb, s_new, s)
            score_ref[0] = s
            if emit_lbf:
                # guard the pad carts' nvis bump (k is traced, K static)
                nvis_ref[0] = nvis_ref[0] + jnp.where(k < K, al, 0)
            else:
                nvis_ref[0] = nvis_ref[0] + al
            alive_ref[0] = jnp.where(
                alb & (s >= tabf_ref[k, leaf_n + 2]), 1, 0
            )
            leaf = None
            for i, bb in enumerate(bits):
                v = bb << (depth - 2 - i)
                leaf = v if leaf is None else leaf + v
            return leaf

        if emit_lbf:
            bi = pl.program_id(0)

            def word_body(w, _):
                acc = None
                for i in range(LBF_PER_WORD):
                    v = one_cart(w * LBF_PER_WORD + i) << (LBF_BITS * i)
                    acc = v if acc is None else acc | v
                word[0] = acc
                cp = pltpu.make_async_copy(word.at[0], lbf_hbm.at[bi, w], sem)
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(0, NW, word_body, 0)
        else:
            def cart_body(k, _):
                one_cart(k)
                return 0

            jax.lax.fori_loop(0, K, cart_body, 0)

    out_specs = [
        pl.BlockSpec(
            (1, ny8, nx128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        for _ in range(3)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, ny8, nx128), jnp.float32),
        jax.ShapeDtypeStruct((B, ny8, nx128), jnp.int32),
        jax.ShapeDtypeStruct((B, ny8, nx128), jnp.int32),
    ]
    scratch = [pltpu.VMEM((s2 * NV, Hp, Wp), jnp.int8)]
    if emit_lbf:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((B, NW, ny8, nx128), jnp.int32)
        )
        scratch += [
            pltpu.VMEM((1, ny8, nx128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                tabi.shape, lambda b: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                tabf.shape, lambda b: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, s2, Hp, Wp),
                lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(tabi, tabf, ph)
    score, alive, nvis = outs[:3]
    res = (
        score[:, :ny, :nx],
        alive[:, :ny, :nx] != 0,
        nvis[:, :ny, :nx],
    )
    if emit_lbf:
        # [B, NW, ny8, nx128] -> [B, ny, nx, NW]
        res = res + (outs[3].transpose(0, 2, 3, 1)[:, :ny, :nx, :],)
    return res


def _scale_filter_pallas_tiled(
    img: jnp.ndarray,  # [B, H, W] int32
    tabi: jnp.ndarray,
    tabf: jnp.ndarray,
    *,
    step: int,
    ny: int,
    nx: int,
    depth: int,
    geom: dict,
    emit_lbf: bool = False,
):
    """Column-tiled variant of the resident kernel: phase planes stay in
    HBM and every grid step (b, j) DMAs one 128-aligned column slab of all
    s^2 planes into VMEM, then runs the full in-kernel cart loop on it.
    This serves grids whose full planes exceed VMEM (1080p scale-0 is
    ~10 MB); the DMA is once per tile, not per cart, so the crop loop stays
    VMEM-speed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = img.shape[0]
    K = tabi.shape[0]
    node_n = (1 << (depth - 1)) - 1
    leaf_n = node_n + 1
    ny8, nx128 = geom["ny8"], geom["nx128"]
    NYB = geom["NYB"]
    Hp, Wp = geom["Hp"], geom["Wp"]
    s2 = geom["s2"]
    NXT = geom["ctile"]
    WT = NXT + 128  # lane headroom: crop offset v <= umax < 128
    n_ct = -(-nx128 // NXT)
    ph = _phase_decompose(img, step, hp=Hp, wp=Wp)  # [B, s2, Hp, Wp]
    NW = lbf_words(K)
    if emit_lbf:
        tabi, tabf = _pad_noop_carts(
            tabi, tabf, leaf_n, NW * LBF_PER_WORD - K
        )

    def kernel(tabi_ref, tabf_ref, ph_hbm, score_ref, alive_ref, nvis_ref,
               *rest):
        if emit_lbf:
            lbf_hbm, tile, sem, word, wsem = rest
        else:
            tile, sem = rest
        bi = pl.program_id(0)
        j = pl.program_id(1)
        # one DMA per grid step: all planes' column slab [s2, Hp, WT]
        # (the HBM operand is the FULL [B, s2, Hp, Wp] array — Pallas HBM
        # blocks must be whole-array with a trivial index map; the batch
        # is selected here, inside the DMA)
        pltpu.make_async_copy(
            ph_hbm.at[bi, :, :, pl.ds(j * NXT, WT)], tile, sem
        ).start()

        score_ref[0] = jnp.zeros((ny8, NXT), jnp.float32)
        alive_ref[0] = jnp.ones((ny8, NXT), jnp.int32)
        nvis_ref[0] = jnp.zeros((ny8, NXT), jnp.int32)
        pltpu.make_async_copy(
            ph_hbm.at[bi, :, :, pl.ds(j * NXT, WT)], tile, sem
        ).wait()

        def crop(k, o):
            pi = tabi_ref[k, o]
            u = tabi_ref[k, o + 1]
            v = tabi_ref[k, o + 2]
            u_al = pl.multiple_of((u // 8) * 8, 8)
            buf = tile[pi, pl.ds(u_al, NYB), :]  # [NYB, WT]
            ru = u - u_al
            rows = pltpu.roll(buf, (NYB - ru) % NYB, 0)[:ny8, :]
            return pltpu.roll(rows, (WT - v) % WT, 1)[:, :NXT]

        def bit_sel(planes, bits_i32):
            if not bits_i32:
                return planes[0]
            half = len(planes) // 2
            return jnp.where(
                bits_i32[0] != 0,
                bit_sel(planes[half:], bits_i32[1:]),
                bit_sel(planes[:half], bits_i32[1:]),
            )

        def one_cart(k):
            s = score_ref[0]
            al = alive_ref[0]
            vals = [crop(k, 6 * jj) - crop(k, 6 * jj + 3) for jj in range(node_n)]
            bits = []
            for r in range(depth - 1):
                planes = [
                    (vals[jj] > tabi_ref[k, 6 * node_n + jj]).astype(jnp.int32)
                    for jj in range((1 << r) - 1, (1 << (r + 1)) - 1)
                ]
                bits.append(bit_sel(planes, bits))
            leaf_planes = [
                jnp.full((ny8, NXT), tabf_ref[k, jj], jnp.float32)
                for jj in range(leaf_n)
            ]
            b = bit_sel(leaf_planes, bits)
            alb = al != 0
            s_new = (s + b - tabf_ref[k, leaf_n]) / tabf_ref[k, leaf_n + 1]
            s = jnp.where(alb, s_new, s)
            score_ref[0] = s
            if emit_lbf:
                nvis_ref[0] = nvis_ref[0] + jnp.where(k < K, al, 0)
            else:
                nvis_ref[0] = nvis_ref[0] + al
            alive_ref[0] = jnp.where(
                alb & (s >= tabf_ref[k, leaf_n + 2]), 1, 0
            )
            leaf = None
            for i, bb in enumerate(bits):
                v = bb << (depth - 2 - i)
                leaf = v if leaf is None else leaf + v
            return leaf

        if emit_lbf:
            def word_body(w, _):
                acc = None
                for i in range(LBF_PER_WORD):
                    v = one_cart(w * LBF_PER_WORD + i) << (LBF_BITS * i)
                    acc = v if acc is None else acc | v
                word[0] = acc
                cp = pltpu.make_async_copy(
                    word.at[0],
                    lbf_hbm.at[bi, w, :, pl.ds(j * NXT, NXT)],
                    wsem,
                )
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(0, NW, word_body, 0)
        else:
            def cart_body(k, _):
                one_cart(k)
                return 0

            jax.lax.fori_loop(0, K, cart_body, 0)

    out_specs = [
        pl.BlockSpec(
            (1, ny8, NXT), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM
        )
        for _ in range(3)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, ny8, n_ct * NXT), jnp.float32),
        jax.ShapeDtypeStruct((B, ny8, n_ct * NXT), jnp.int32),
        jax.ShapeDtypeStruct((B, ny8, n_ct * NXT), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((s2, Hp, WT), jnp.int32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if emit_lbf:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((B, NW, ny8, n_ct * NXT), jnp.int32)
        )
        scratch += [
            pltpu.VMEM((1, ny8, NXT), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(B, n_ct),
        in_specs=[
            pl.BlockSpec(
                tabi.shape, lambda b, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                tabf.shape, lambda b, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (B, s2, Hp, Wp),
                lambda b, j: (0, 0, 0, 0),
                memory_space=pltpu.MemorySpace.HBM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(tabi, tabf, ph)
    score, alive, nvis = outs[:3]
    res = (
        score[:, :ny, :nx],
        alive[:, :ny, :nx] != 0,
        nvis[:, :ny, :nx],
    )
    if emit_lbf:
        res = res + (outs[3].transpose(0, 2, 3, 1)[:, :ny, :nx, :],)
    return res


def mixed_tables(
    tabs, scales, node_n: int
):
    """Per-scale device tables for stage0_filter_mixed: node_tables dict
    plus (when the resident kernel applies) the packed SMEM rows."""
    out = []
    for tab, (win, step, ny, nx) in zip(tabs, scales):
        d = {k: jnp.asarray(v) for k, v in tab.items()}
        tabi, tabf = pack_tables(tab, node_n)
        d["tabi"] = jnp.asarray(tabi)
        d["tabf"] = jnp.asarray(tabf)
        out.append(d)
    return tuple(out)


def stage0_filter_mixed(
    img: jnp.ndarray,  # [B, H, W] int32
    tabs,  # mixed_tables output
    *,
    meta: Tuple[Tuple[int, int, int, int], ...],
    depth: int,
    static_tabs=None,  # per-scale HOST node_tables (or None) — closed
    # over, never traced; enables the static-slice path for small grids
    emit_lbf: bool = False,  # also return packed stage-0 leaf words
    # [B, n, lbf_words(K)] (see _scale_filter)
):
    """Full stage-0: resident Pallas kernel where the phase planes fit in
    VMEM, static-slice unroll for small grids (when host tables are
    provided), XLA scan elsewhere.  Output layout identical to
    stage0_filter_all_scales."""
    B, H, W = img.shape
    scores, alives, nviss, lbfs = [], [], [], []
    for i, ((win, step, ny, nx), tab) in enumerate(zip(meta, tabs)):
        geom = _resident_geom(H, W, win, step, ny, nx)
        st = static_tabs[i] if static_tabs is not None else None
        if (
            geom is None
            and st is not None
            and ny * nx <= STATIC_MAX_WINDOWS
        ):
            out = _scale_filter_static(
                img, tab, st, step=step, ny=ny, nx=nx, depth=depth,
                emit_lbf=emit_lbf,
            )
        elif geom is not None and geom["ctile"] is not None:
            out = _scale_filter_pallas_tiled(
                img,
                tab["tabi"],
                tab["tabf"],
                step=step,
                ny=ny,
                nx=nx,
                depth=depth,
                geom=geom,
                emit_lbf=emit_lbf,
            )
        elif (
            geom is not None
            and _rolled_fits(geom, depth)
            and _os.environ.get("JDA_TPU_DENSE_ROLLED", "1") != "0"
        ):
            out = _scale_filter_pallas_rolled(
                img,
                tab["tabi"],
                tab["tabf"],
                step=step,
                ny=ny,
                nx=nx,
                depth=depth,
                geom=geom,
                emit_lbf=emit_lbf,
            )
        elif geom is not None:
            out = _scale_filter_pallas_resident(
                img,
                tab["tabi"],
                tab["tabf"],
                step=step,
                ny=ny,
                nx=nx,
                depth=depth,
                geom=geom,
                emit_lbf=emit_lbf,
            )
        else:
            base = {
                k: v for k, v in tab.items() if k not in ("tabi", "tabf")
            }
            out = _scale_filter(
                img, base, step=step, ny=ny, nx=nx, depth=depth,
                emit_lbf=emit_lbf,
            )
        s, a, nv = out[:3]
        scores.append(s.reshape(B, ny * nx))
        alives.append(a.reshape(B, ny * nx))
        nviss.append(nv.reshape(B, ny * nx))
        if emit_lbf:
            lbfs.append(out[3].reshape(B, ny * nx, -1))
    res = (
        jnp.concatenate(scores, axis=1),
        jnp.concatenate(alives, axis=1),
        jnp.concatenate(nviss, axis=1),
    )
    if emit_lbf:
        return res + (jnp.concatenate(lbfs, axis=1),)
    return res


@functools.partial(jax.jit, static_argnames=("meta", "depth", "emit_lbf"))
def stage0_filter_all_scales(
    img: jnp.ndarray,  # [B, H, W] int32
    tabs: Tuple[Dict[str, jnp.ndarray], ...],  # one table per scan scale
    *,
    meta: Tuple[Tuple[int, int, int, int], ...],  # (win, step, ny, nx)
    depth: int,
    emit_lbf: bool = False,
):
    """Full stage-0 over every scan scale in ONE program/dispatch.

    Outputs are flattened per scale and concatenated in the reference's
    window enumeration order (win outer, y middle, x inner — c/jda.c:331-339),
    so index i here is window i of detect.enumerate_windows.
    Returns (score [B, n], alive [B, n], nvis [B, n]) and, with emit_lbf,
    packed stage-0 leaf words [B, n, lbf_words(K)].
    """
    scores, alives, nviss, lbfs = [], [], [], []
    B = img.shape[0]
    for (win, step, ny, nx), tab in zip(meta, tabs):
        out = _scale_filter(
            img, tab, step=step, ny=ny, nx=nx, depth=depth, emit_lbf=emit_lbf
        )
        s, a, nv = out[:3]
        scores.append(s.reshape(B, ny * nx))
        alives.append(a.reshape(B, ny * nx))
        nviss.append(nv.reshape(B, ny * nx))
        if emit_lbf:
            lbfs.append(out[3].reshape(B, ny * nx, -1))
    res = (
        jnp.concatenate(scores, axis=1),
        jnp.concatenate(alives, axis=1),
        jnp.concatenate(nviss, axis=1),
    )
    if emit_lbf:
        return res + (jnp.concatenate(lbfs, axis=1),)
    return res
