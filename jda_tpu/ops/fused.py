"""Fused single-dispatch detection pipeline.

The reference detector's economics come from per-window early exit
(/root/reference/c/jda.c:360-414: most windows die within a few carts).
Round-1's batched pipeline recovered that with a dense stage-0 filter +
host-side survivor compaction, but paid ~50-80 ms of relay dispatch/transfer
latency per device round trip.  This module fuses the whole cascade into ONE
jit program per (batch, canonical dims, scale ladder):

  1. dense stage-0 filter over every scan scale (ops/dense0.py) — zero
     gathers, pure shifted-crop arithmetic;
  2. on-device survivor compaction into a fixed lane budget (cumsum +
     scatter-drop);
  3. stage-0 leaf rerun on the compacted lanes (the only pass that still
     needs pixel gathers at full stage width; its score/alive state comes
     from the dense filter, so only the tree descent runs);
  4. stages 1..T-1 with *per-stage* on-device compaction: a trained cascade
     keeps rejecting at every stage, so each stage runs on a geometrically
     smaller lane budget — the gather bill tracks the true survivor
     population instead of the stage-0 budget.

Budgets are static (XLA needs static shapes); the program returns the true
per-stage survivor counts so the host can detect overflow, double the
budget, and recompile (self-tuning, rare).  All arithmetic is bit-identical
to the unfused path: compaction only re-packs lanes, and every per-window
float sequence (score chain, exact sequential regression) is unchanged.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from jda_tpu.ops import cascade as C
from jda_tpu.ops import dense0 as D0
from jda_tpu.ops import mxu_tail as MT


def _gather_u8() -> bool:
    """Tail descend gathers read u8 planes instead of int32 (¼ the bytes;
    the B=8 VGA plane set then fits VMEM).  Values are cast to int32 after
    the take — arithmetic identical.  A/B knob, read at trace time."""
    import os

    return os.environ.get("JDA_TPU_GATHER_U8", "0") != "0"


def compact(alive: jnp.ndarray, budget: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack indices of alive lanes into a fixed [budget] buffer.

    Returns (sel [budget] int32 with -1 padding, count).  Lanes beyond the
    budget are dropped (the caller checks count <= budget and retries with a
    bigger budget).  Order-preserving, so downstream results are invariant
    to the compaction itself.
    """
    n = alive.shape[0]
    pos = jnp.cumsum(alive.astype(jnp.int32)) - 1
    pos = jnp.where(alive, pos, budget)  # dead -> out of bounds -> dropped
    idx = jnp.arange(n, dtype=jnp.int32)
    sel = jnp.full((budget,), -1, jnp.int32).at[pos].set(idx, mode="drop")
    return sel, jnp.sum(alive.astype(jnp.int32))


def _gather_state(state: Dict[str, jnp.ndarray], selc, valid) -> Dict[str, jnp.ndarray]:
    out = {k: v[selc] for k, v in state.items()}
    out["alive"] = valid
    return out


def unpack_lbf(words: jnp.ndarray, K: int) -> jnp.ndarray:
    """[N, lbf_words(K)] packed stage-0 leaf words -> [N, K] leaf indices
    (4 bits per cart, cart k in word k//8 at nibble k%8 — ops/dense0.py)."""
    rep = jnp.repeat(words, D0.LBF_PER_WORD, axis=1)[:, :K]
    sh = (
        jnp.arange(K, dtype=jnp.int32) % D0.LBF_PER_WORD
    ) * D0.LBF_BITS
    return (rep >> sh[None, :]) & ((1 << D0.LBF_BITS) - 1)


# carts per leading chunk of stages >= 1: trained cascades front-load
# rejection within a stage too (realistic_drop_profile / the reference's
# per-cart thresholds), so compacting after the first SPLIT carts roughly
# halves the lanes the remaining K - SPLIT carts pay gathers for
STAGE_SPLIT = 64


def default_budgets(n_windows: int, B: int, T: int, K: int) -> Tuple[int, ...]:
    """Initial lane budgets (flat, in compaction order).

    budgets[0]: dense survivors (stage-0 rerun + stage-1 leading chunk).
    Then, per stage t in [1, T-1]: a mid-stage budget (after STAGE_SPLIT
    carts, only when K > 2*STAGE_SPLIT) and a post-stage budget (except
    after the last stage).  Sized for a trained cascade (~0.5% stage-0
    pass, ~2/3 attrition per compaction point); the fused program reports
    true counts so callers double any overflowed entry and recompile.
    """
    total = n_windows * B
    split = K > 2 * STAGE_SPLIT
    if total <= 4096:
        # small problems (tests, tiny frames): full-capacity lanes — no
        # compaction benefit and no overflow recompiles, one compile ever
        n_entries = 1 + (T - 1) * (2 if split else 1) - (1 if T > 1 else 0)
        cap = -(-total // 256) * 256
        return tuple([cap] * max(n_entries, 1))
    s0 = max(1024, -(-total // 192) // 512 * 512)
    out = [s0]
    cur = s0
    for t in range(1, T):
        if split:
            cur = max(512, -(-cur * 5 // 8) // 256 * 256)
            out.append(cur)  # mid-stage
        if t < T - 1:
            cur = max(512, -(-cur * 5 // 8) // 256 * 256)
            out.append(cur)  # post-stage
    return tuple(out)


def make_fused_fn(
    *,
    meta: Tuple[Tuple[int, int, int, int], ...],  # (win, step, ny, nx) per scale
    depth: int,
    leaf_n: int,
    T: int,
    H: int,
    W: int,
    budgets: Tuple[int, ...],  # budgets[0] = stage-0 rerun lanes (also carries
    # stage 1); budgets[t] = lanes kept after stage t's rejections, t in
    # [1, T-2].  Need not be powers of two — any static size compiles.
    use_pallas: bool = False,
    rounding: bool = False,  # False = C trunc (jdaDetect), True = C++ round
    static_tabs=None,  # per-scale HOST node tables for the static-slice
    # small-grid filter (closed over, never traced) — see ops/dense0.py
    s0_lbf: bool = False,  # dense filter emits packed stage-0 leaf words;
    # the tail reads them instead of re-descending stage 0 (saves
    # K * (depth-1) * 2 pixel gathers per survivor lane)
):
    """Build the fused program for one static geometry.  The returned fn is
    jit-compiled on first call; all dynamic data (model, images, window
    tables) are ordinary traced args."""

    n_windows = sum(ny * nx for _, _, ny, nx in meta)

    @jax.jit
    def run(
        dev: Dict[str, jnp.ndarray],
        imgs: jnp.ndarray,  # [B, H, W] uint8 or int32
        dims: jnp.ndarray,  # [B, 2] int32 (img_w, img_h) per image
        tabs,  # dense-filter tables: tuple of dicts (XLA) or (tabi, tabf) (pallas)
        xywin: jnp.ndarray,  # [n, 3] int32 window (x, y, win) in enumeration order
    ) -> Dict[str, jnp.ndarray]:
        B = imgs.shape[0]
        # tail gathers read the u8 planes (2.46 MB/B=8 VGA vs 9.8 MB as
        # int32 — small enough to stay VMEM-resident between gathers);
        # values are cast to int32 AFTER the take, so the pixel-diff
        # arithmetic is unchanged (JDA_TPU_GATHER_U8=0 restores int32)
        imgs_u8 = imgs
        imgs = imgs.astype(jnp.int32)
        n = n_windows

        # -- 1. dense stage-0 over all scales --------------------------------
        if use_pallas:
            dense = D0.stage0_filter_mixed(
                imgs, tabs, meta=meta, depth=depth, static_tabs=static_tabs,
                emit_lbf=s0_lbf,
            )
        else:
            dense = D0.stage0_filter_all_scales(
                imgs, tabs, meta=meta, depth=depth, emit_lbf=s0_lbf
            )
        score_d, alive_d, nvis_d = dense[:3]
        lbf_d = dense[3] if s0_lbf else None

        # per-image validity on the canonical grid: window must fit inside
        # the image's own dims (x <= w - win implies win <= w)
        x = xywin[:, 0][None, :]
        y = xywin[:, 1][None, :]
        win = xywin[:, 2][None, :]
        ok = (x <= dims[:, 0][:, None] - win) & (y <= dims[:, 1][:, None] - win)
        alive_flat = (alive_d & ok).reshape(-1)
        # per-image cart-visit bank (exact DetectionStatistic per image,
        # test.cpp:146-149 — not an apportioned batch total)
        nvis_img = jnp.sum(jnp.where(ok, nvis_d, 0), axis=1)

        # -- 2. compaction into the stage-0 rerun budget ---------------------
        S0 = budgets[0]
        sel, count0 = compact(alive_flat, S0)
        valid = sel >= 0
        selc = jnp.maximum(sel, 0)
        b_idx = selc // n
        w_idx = selc % n
        base_o = (b_idx * (H * W) + xywin[w_idx, 1] * W + xywin[w_idx, 0]).astype(
            jnp.int32
        )
        win_s = xywin[w_idx, 2]
        base = jnp.stack([base_o] * 3, axis=1)
        stride = jnp.full((S0, 3), W, jnp.int32)
        pw = jnp.stack([win_s] * 3, axis=1)
        state = C.init_state(S0, dev["mean_shape"], base, stride, pw, pw, valid)
        state["score"] = jnp.where(valid, score_d.reshape(-1)[selc], 0.0)
        state["nvis"] = jnp.where(valid, nvis_d.reshape(-1)[selc], 0)
        # snapshot of the dense nvis per lane: tail telemetry counts only
        # increments beyond it (rides along through compactions)
        state["dnvis"] = state["nvis"]

        flat_img = (imgs_u8 if _gather_u8() else imgs).reshape(-1)
        K = dev["feat_th"].shape[1]

        # -- 3. stage-0 leaves: read back the dense filter's packed path
        # words (s0_lbf) or re-descend on the compacted lanes ---------------
        if s0_lbf:
            words = lbf_d.reshape(B * n, -1)[selc]
            leaves0 = unpack_lbf(words, K)
        else:
            sp0 = C.stage_params(dev, 0)
            leaves0, _ = C.carts_descend(
                sp0, flat_img, state, depth=depth, rounding=rounding,
                single_scale=True,
            )
        state = C.apply_regression(dev["W"][0], leaves0, state, leaf_n=leaf_n)

        counts = [count0]
        sel_global = jnp.where(valid, selc, -1)  # lane -> flat (b*n + w) id
        split = K > 2 * STAGE_SPLIT
        bi_cursor = 1  # next entry of the flat budget tuple

        def bank_nvis(nvis_img, state, sel_global, mask):
            """Add masked lanes' post-dense visit increments to their own
            image's bank (lane image id = sel_global // n)."""
            bid = jnp.where(sel_global >= 0, sel_global // n, 0)
            inc = jnp.where(mask, state["nvis"] - state["dnvis"], 0)
            return nvis_img.at[bid].add(inc)

        def do_compact(state, sel_global, nvis_img, budget, carried=None):
            lsel, cnt = compact(state["alive"], budget)
            lvalid = lsel >= 0
            lselc = jnp.maximum(lsel, 0)
            # lanes dropped here were rejected mid-tail: bank their
            # post-dense visit increments before they disappear
            dropped = (sel_global >= 0) & ~state["alive"]
            nvis_img = bank_nvis(nvis_img, state, sel_global, dropped)
            state = _gather_state(state, lselc, lvalid)
            sel_global = jnp.where(lvalid, sel_global[lselc], -1)
            carried = None if carried is None else carried[lselc]
            return state, sel_global, nvis_img, cnt, carried

        # -- 4. stages 1..T-1 -------------------------------------------------
        # Stage 1 necessarily starts on every stage-0 survivor; lanes are
        # re-compacted mid-stage (front-loaded in-stage rejection) and after
        # each stage, so each cart chunk's gather bill tracks the true
        # survivor population.
        for t in range(1, T):
            sp = C.stage_params(dev, t)
            if split:
                spA = {k: v[:STAGE_SPLIT] for k, v in sp.items()}
                spB = {k: v[STAGE_SPLIT:] for k, v in sp.items()}
                state, leavesA = C.run_cart_chunk(
                    spA,
                    flat_img,
                    state,
                    depth=depth,
                    rounding=rounding,
                    single_scale=True,
                )
                state, sel_global, nvis_img, cnt, leavesA = do_compact(
                    state, sel_global, nvis_img, budgets[bi_cursor], leavesA
                )
                counts.append(cnt)
                bi_cursor += 1
                state, leavesB = C.run_cart_chunk(
                    spB,
                    flat_img,
                    state,
                    depth=depth,
                    rounding=rounding,
                    single_scale=True,
                )
                leaves = jnp.concatenate([leavesA, leavesB], axis=1)
            else:
                state, leaves = C.run_cart_chunk(
                    sp,
                    flat_img,
                    state,
                    depth=depth,
                    rounding=rounding,
                    single_scale=True,
                )
            state = C.apply_regression(dev["W"][t], leaves, state, leaf_n=leaf_n)
            if t < T - 1:
                state, sel_global, nvis_img, cnt, _ = do_compact(
                    state, sel_global, nvis_img, budgets[bi_cursor]
                )
                counts.append(cnt)
                bi_cursor += 1

        # post-dense increments of every lane still resident after stage T-1
        nvis_img = bank_nvis(nvis_img, state, sel_global, sel_global >= 0)

        return {
            "sel": sel_global,  # [budgets[-1]] flat window id or -1
            "score": state["score"],
            "shape": state["shape"],
            "alive": state["alive"] & (sel_global >= 0),
            "nvis": state["nvis"],
            "counts": jnp.stack(counts),
            "nvis_img": nvis_img,  # [B] exact per-image cart visits
            "total_nvis": jnp.sum(nvis_img),
        }

    return run


# ---------------------------------------------------------------------------
# Fused pipeline v2: MXU canvas tail, grouped by window-size bucket.
#
# v1 (make_fused_fn above) re-descended stage 0 on every dense survivor and
# ran the whole tail on XLA pixel gathers (~100-130 M elem/s) — at 1080p
# populations that wall dominated the frame.  v2 materializes each
# surviving window's pixels ONCE into a per-lane canvas and runs every
# cascade stage as one-hot MXU contractions (ops/mxu_tail.py): the tail's
# per-lane cost drops from 16,200 gathered pixels to win^2 gathered pixels
# + MXU compute.  Lanes are grouped by window-size bucket so the canvas
# cost tracks each scale's true window size; scales past the MXU breakeven
# (win > GATHER_MIN) keep the v1 gather tail — they are a few hundred
# windows of any ladder.
# ---------------------------------------------------------------------------

GATHER_MIN = 257  # smallest win that stays on the gather tail


def group_scales(
    meta: Tuple[Tuple[int, int, int, int], ...],
    buckets: Tuple[int, ...] = (32, 64, 128, 256),
) -> Tuple[dict, ...]:
    """Partition the scan ladder into canvas-bucket groups.

    meta is in enumeration order (win ascending, c/jda.c:331-332), so each
    group is a contiguous run of scales and a contiguous window-index
    slice.  Returns dicts {S (canvas size; None = gather tail), si0, si1
    (scale range), w0, w1 (flat window range)}.
    """
    offs = [0]
    for _, _, ny, nx in meta:
        offs.append(offs[-1] + ny * nx)
    groups = []
    si = 0
    for S in buckets:
        sj = si
        while sj < len(meta) and meta[sj][0] <= S:
            sj += 1
        if sj > si:
            groups.append(
                {"S": S, "si0": si, "si1": sj, "w0": offs[si], "w1": offs[sj]}
            )
            si = sj
    if si < len(meta):
        groups.append(
            {
                "S": None,
                "si0": si,
                "si1": len(meta),
                "w0": offs[si],
                "w1": offs[-1],
            }
        )
    return tuple(groups)


def default_budgets2(
    meta: Tuple[Tuple[int, int, int, int], ...],
    groups: Tuple[dict, ...],
    B: int,
    T: int,
) -> Tuple[int, ...]:
    """Flat per-group budget tuple: for each group, a stage-0 survivor
    budget then T-2 post-stage budgets (compaction after stages 1..T-2).
    Sized like v1 (~0.5% stage-0 pass, ~5/8 attrition per stage); the
    program reports true counts and the caller grows any overflowed entry.
    """
    out = []
    for g in groups:
        total = (g["w1"] - g["w0"]) * B
        if total <= 4096:
            cap = max(-(-total // 256) * 256, 256)
            out.extend([cap] * max(1 + max(T - 2, 0), 1))
            continue
        s0 = max(512, -(-total // 192) // 256 * 256)
        out.append(s0)
        cur = s0
        for _ in range(max(T - 2, 0)):
            cur = max(256, -(-cur * 5 // 8) // 256 * 256)
            out.append(cur)
    return tuple(out)


def make_fused_fn2(
    *,
    meta: Tuple[Tuple[int, int, int, int], ...],
    depth: int,
    leaf_n: int,
    T: int,
    H: int,
    W: int,
    groups: Tuple[dict, ...],
    budgets: Tuple[int, ...],  # default_budgets2 layout
    use_pallas: bool = False,
    rounding: bool = False,
    origins: Optional[Tuple[Tuple[int, int], ...]] = None,
    canvas_mode: str = "rows",  # gather | rows (canvas materialization)
    static_tabs=None,  # host node tables for small grids (make_fused_fn)
    s0_lbf: bool = False,  # see make_fused_fn
):
    """Grouped canvas-tail fused program.  Same contract as make_fused_fn:
    returns {sel, score, shape, alive, nvis, counts, total_nvis} with sel
    indexing the flat (b * n + w) window id; outputs are the concatenation
    of the groups' final lanes.

    canvas_mode picks how survivor canvases are materialized: "gather"
    (jnp.take element gather — the wall) or "rows" (row-span slice gather,
    ~S-fold cheaper).  A per-lane 2D-DMA Pallas canvas existed through
    round 4 but faulted the TPU worker inside the fused program and lost
    every A/B it was reachable from (PERF.md r3/r4); it was removed.

    origins (optional) gives each meta entry a canvas origin (y0, x0) —
    used by banded scans (method-0 pyramid packing, 1080p row bands) whose
    window grids do not start at (0, 0).  With origins set, dims may be
    [B, S, 2] (per-band content (w, h), band-local), so each band of a
    packed canvas masks windows against its own content rectangle; [B, 2]
    dims broadcast over bands.
    """
    n_windows = sum(ny * nx for _, _, ny, nx in meta)
    entries_per_group = 1 + max(T - 2, 0)
    if origins is None:
        origins = ((0, 0),) * len(meta)
    # static per-window scale-index / origin vectors (enumeration order)
    _sidx = np.concatenate(
        [np.full(ny * nx, s, np.int32) for s, (_, _, ny, nx) in enumerate(meta)]
    ) if meta else np.zeros(0, np.int32)
    _oy = np.asarray([o[0] for o in origins], np.int32)
    _ox = np.asarray([o[1] for o in origins], np.int32)

    @jax.jit
    def run(
        dev: Dict[str, jnp.ndarray],
        imgs: jnp.ndarray,  # [B, H, W] uint8/int32
        dims: jnp.ndarray,  # [B, 2] or [B, S, 2] int32 (w, h)
        tabs,
        xywin: jnp.ndarray,  # [n, 3] int32
    ) -> Dict[str, jnp.ndarray]:
        B = imgs.shape[0]
        imgs_u8 = imgs
        imgs = imgs.astype(jnp.int32)
        n = n_windows

        if use_pallas:
            dense = D0.stage0_filter_mixed(
                imgs, tabs, meta=meta, depth=depth, static_tabs=static_tabs,
                emit_lbf=s0_lbf,
            )
        else:
            dense = D0.stage0_filter_all_scales(
                imgs, tabs, meta=meta, depth=depth, emit_lbf=s0_lbf
            )
        score_d, alive_d, nvis_d = dense[:3]
        lbf_d = dense[3] if s0_lbf else None
        K = dev["feat_th"].shape[1]

        x = xywin[:, 0][None, :]
        y = xywin[:, 1][None, :]
        win = xywin[:, 2][None, :]
        sidx = jnp.asarray(_sidx)
        if dims.ndim == 3:
            wl = jnp.take(dims[:, :, 0], sidx, axis=1)  # [B, n]
            hl = jnp.take(dims[:, :, 1], sidx, axis=1)
        else:
            wl = dims[:, 0][:, None]
            hl = dims[:, 1][:, None]
        xl = x - jnp.take(jnp.asarray(_ox), sidx)[None, :]  # band-local
        yl = y - jnp.take(jnp.asarray(_oy), sidx)[None, :]
        ok = (xl <= wl - win) & (yl <= hl - win)
        alive_ok = alive_d & ok
        # per-image cart-visit bank (exact per-image DetectionStatistic)
        nvis_img = jnp.sum(jnp.where(ok, nvis_d, 0), axis=1)

        def bank_nvis(nvis_img, state, sel_global, mask):
            bid = jnp.where(sel_global >= 0, sel_global // n, 0)
            inc = jnp.where(mask, state["nvis"] - state["dnvis"], 0)
            return nvis_img.at[bid].add(inc)

        # canvas materialization stays int32 (MT.canvas_* contract); only
        # the direct descend gathers read the u8 planes (see make_fused_fn)
        flat_img = imgs.reshape(-1)
        flat_gather = (imgs_u8 if _gather_u8() else imgs).reshape(-1)
        outs = []  # per-group {sel, score, shape, alive, nvis}
        counts = []

        for gi, g in enumerate(groups):
            w0, w1 = g["w0"], g["w1"]
            ng = w1 - w0
            gb = budgets[gi * entries_per_group : (gi + 1) * entries_per_group]

            # -- group compaction over [B, ng] dense survivors ------------
            al_g = alive_ok[:, w0:w1].reshape(-1)
            S0 = gb[0]
            sel, cnt0 = compact(al_g, S0)
            counts.append(cnt0)
            valid = sel >= 0
            selc = jnp.maximum(sel, 0)
            b_idx = selc // ng
            wl = selc % ng  # window index within the group slice
            wx = xywin[w0 + wl, 0]
            wy = xywin[w0 + wl, 1]
            ws = xywin[w0 + wl, 2]
            sel_global = jnp.where(valid, b_idx * n + (w0 + wl), -1)

            score0 = jnp.where(
                valid, score_d[:, w0:w1].reshape(-1)[selc], 0.0
            )
            nvis0 = jnp.where(valid, nvis_d[:, w0:w1].reshape(-1)[selc], 0)
            lbf0 = (
                unpack_lbf(
                    lbf_d[:, w0:w1].reshape(B * ng, -1)[selc], K
                )
                if s0_lbf
                else None
            )

            if g["S"] is not None:
                # ---- MXU canvas tail -----------------------------------
                S = g["S"]
                if canvas_mode == "rows":
                    canvas = MT.canvas_rows(flat_img, b_idx, wx, wy, H, W, S)
                else:
                    canvas = MT.canvas_from_windows(
                        flat_img, b_idx, wx, wy, H, W, S
                    )
                state = {
                    "shape": jnp.broadcast_to(
                        dev["mean_shape"], (S0, dev["mean_shape"].shape[-1])
                    ).astype(jnp.float32),
                    "score": score0,
                    "alive": valid,
                    "nvis": nvis0,
                    "dnvis": nvis0,
                    "pw": ws,
                }
                # stage-0 leaves (descent only: dense already scored)
                if s0_lbf:
                    leaves0 = lbf0
                else:
                    leaves0, _ = MT.descend_canvas(
                        C.stage_params(dev, 0),
                        canvas,
                        state["pw"],
                        state["shape"],
                        depth=depth,
                        rounding=rounding,
                    )
                state = C.apply_regression(
                    dev["W"][0], leaves0, state, leaf_n=leaf_n
                )
                for t in range(1, T):
                    state, leaves = MT.run_cart_chunk_canvas(
                        C.stage_params(dev, t),
                        canvas,
                        state,
                        depth=depth,
                        rounding=rounding,
                    )
                    state = C.apply_regression(
                        dev["W"][t], leaves, state, leaf_n=leaf_n
                    )
                    if t < T - 1:
                        lsel, cnt = compact(state["alive"], gb[t])
                        counts.append(cnt)
                        lvalid = lsel >= 0
                        lselc = jnp.maximum(lsel, 0)
                        dropped = (sel_global >= 0) & ~state["alive"]
                        nvis_img = bank_nvis(
                            nvis_img, state, sel_global, dropped
                        )
                        state = _gather_state(state, lselc, lvalid)
                        canvas = MT.compact_canvas(canvas, lselc)
                        sel_global = jnp.where(lvalid, sel_global[lselc], -1)
            else:
                # ---- gather tail (large windows; a few hundred lanes) ---
                base_o = (
                    b_idx * (H * W) + wy * W + wx
                ).astype(jnp.int32)
                base = jnp.stack([base_o] * 3, axis=1)
                stride = jnp.full((S0, 3), W, jnp.int32)
                pw3 = jnp.stack([ws] * 3, axis=1)
                state = C.init_state(
                    S0, dev["mean_shape"], base, stride, pw3, pw3, valid
                )
                state["score"] = score0
                state["nvis"] = nvis0
                state["dnvis"] = nvis0
                if s0_lbf:
                    leaves0 = lbf0
                else:
                    leaves0, _ = C.carts_descend(
                        C.stage_params(dev, 0),
                        flat_gather,
                        state,
                        depth=depth,
                        rounding=rounding,
                        single_scale=True,
                    )
                state = C.apply_regression(
                    dev["W"][0], leaves0, state, leaf_n=leaf_n
                )
                for t in range(1, T):
                    state, leaves = C.run_cart_chunk(
                        C.stage_params(dev, t),
                        flat_gather,
                        state,
                        depth=depth,
                        rounding=rounding,
                        single_scale=True,
                    )
                    state = C.apply_regression(
                        dev["W"][t], leaves, state, leaf_n=leaf_n
                    )
                    if t < T - 1:
                        lsel, cnt = compact(state["alive"], gb[t])
                        counts.append(cnt)
                        lvalid = lsel >= 0
                        lselc = jnp.maximum(lsel, 0)
                        dropped = (sel_global >= 0) & ~state["alive"]
                        nvis_img = bank_nvis(
                            nvis_img, state, sel_global, dropped
                        )
                        state = _gather_state(state, lselc, lvalid)
                        sel_global = jnp.where(lvalid, sel_global[lselc], -1)

            nvis_img = bank_nvis(nvis_img, state, sel_global, sel_global >= 0)
            outs.append(
                {
                    "sel": sel_global,
                    "score": state["score"],
                    "shape": state["shape"],
                    "alive": state["alive"] & (sel_global >= 0),
                    "nvis": state["nvis"],
                }
            )

        return {
            "sel": jnp.concatenate([o["sel"] for o in outs]),
            "score": jnp.concatenate([o["score"] for o in outs]),
            "shape": jnp.concatenate([o["shape"] for o in outs], axis=0),
            "alive": jnp.concatenate([o["alive"] for o in outs]),
            "nvis": jnp.concatenate([o["nvis"] for o in outs]),
            "counts": jnp.stack(counts),
            "nvis_img": nvis_img,  # [B] exact per-image cart visits
            "total_nvis": jnp.sum(nvis_img),
        }

    return run
