"""MXU survivor tail: the post-dense cascade with ZERO pixel gathers.

The fused pipeline's tail (ops/fused.py) evaluated survivors with XLA
gathers from the image — ~100-130 M elem/s on TPU (the scalar-issue wall),
which dominated detection cost: a surviving lane pays T*K*(depth-1)*2 =
16,200 gathered pixels through the full cascade
(/root/reference/c/jda.c:360-414 reads the same pixels pointer-chasing).

Here each surviving window's pixels are materialized ONCE into a per-lane
canvas [N, S, S] (win^2 gathered elements per lane — ~7-18x fewer than the
tail used to gather), and every subsequent pixel read is a one-hot MXU
contraction against the resident canvas — the same zero-gather extraction
the trainer uses (train/features.py feature_values_mxu, measured ~40x
faster than gathers at corpus scale).

Lanes are grouped by window-size bucket S (cost scales with S^2), so small
windows — the overwhelming majority of any scan ladder, c/jda.c:331-339 —
pay small canvases.  Scales above the MXU/gather break-even (~S=256 on
v5e: S^2/MXU-rate vs 2*(depth-1) gathers) stay on the gather path; they
carry a few hundred windows per frame.

Bit-exactness: canvas pixels are (p - 128) int8 so the int8 one-hot
products are exact and the pixel difference cancels the shift; coordinate
arithmetic (float32 multiply, trunc-toward-zero or round-half-away, clamp
to the lane's true patch width) is identical to ops/cascade.carts_descend.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from jda_tpu.ops.cascade import (
    _bit_select,
    _onehot_select,
    round_half_away,
    trunc_toward_zero,
    score_chain,
)


def canvas_from_windows(
    flat_imgs: jnp.ndarray,  # [B*H*W] int32 flat image batch
    b_idx: jnp.ndarray,  # [N] image index per lane
    x: jnp.ndarray,  # [N] window origin
    y: jnp.ndarray,  # [N]
    H: int,
    W: int,
    S: int,
) -> jnp.ndarray:
    """Materialize each lane's window pixels as an [N, S, S] int8 canvas
    (pixel - 128).  Windows smaller than S occupy the top-left corner; the
    padding pixels are whatever the gather clips to and are never read
    (coordinates clamp to the lane's true width).  ONE gather of N*S^2
    elements replaces the tail's T*K*(depth-1)*2 per-lane gathers."""
    base = (b_idx * (H * W) + y * W + x).astype(jnp.int32)  # [N]
    dy = jnp.arange(S, dtype=jnp.int32)[None, :, None] * W
    dx = jnp.arange(S, dtype=jnp.int32)[None, None, :]
    idx = base[:, None, None] + dy + dx  # [N, S, S]
    return (jnp.take(flat_imgs, idx) - 128).astype(jnp.int8)


def canvas_rows(
    flat_imgs: jnp.ndarray,  # [B*H*W] int32
    b_idx: jnp.ndarray,  # [N]
    x: jnp.ndarray,  # [N]
    y: jnp.ndarray,  # [N]
    H: int,
    W: int,
    S: int,
) -> jnp.ndarray:
    """canvas_from_windows via row-span slices instead of element gathers.

    Each canvas row is S CONTIGUOUS pixels; vmap(dynamic_slice) lowers to
    one XLA gather with slice_sizes=(S,), so the per-index scalar-issue
    cost (the ~100-130 M elem/s take() wall, PERF.md microbench) is paid
    once per ROW instead of once per element — an S-fold cut in the
    canvas-materialization bill.  In-bounds results are identical to
    canvas_from_windows; only never-read edge padding can differ
    (dynamic_slice clamps the span start, take clips per element)."""
    base = (b_idx * (H * W) + y * W + x).astype(jnp.int32)  # [N]
    starts = (
        base[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :] * W
    ).reshape(-1)
    rows = jax.vmap(
        lambda st: jax.lax.dynamic_slice(flat_imgs, (st,), (S,))
    )(starts)
    return (rows.reshape(-1, S, S) - 128).astype(jnp.int8)


def compact_canvas(canvas: jnp.ndarray, lselc: jnp.ndarray) -> jnp.ndarray:
    """canvas[lselc] without the int8 gather.

    Lane-indexing an int8 canvas hits XLA:TPU's narrow-dtype gather
    fallback (PERF.md microbench: ~640x slower than int32 gathers).  A
    one-hot int8 MXU contraction moves the same rows at matrix-unit
    throughput: [M, N] x [N, S*S] is a few G-MACs at tail budgets."""
    N, S = canvas.shape[0], canvas.shape[1]
    oh = (lselc[:, None] == jnp.arange(N, dtype=jnp.int32)).astype(jnp.int8)
    flat = canvas.reshape(N, S * S)
    out = jnp.einsum(
        "mn,nf->mf", oh, flat, preferred_element_type=jnp.int32
    )
    return out.astype(jnp.int8).reshape(-1, S, S)


def _pix_mxu(
    canvas: jnp.ndarray,  # [N, S, S] int8 (pixel - 128)
    xq: jnp.ndarray,  # [N, C] int32 column coords
    yq: jnp.ndarray,  # [N, C] int32 row coords
) -> jnp.ndarray:
    """canvas[n, yq, xq] as two one-hot int8 einsums -> [N, C] int32
    (pixel - 128; exact)."""
    S = canvas.shape[-1]
    iota = jnp.arange(S, dtype=jnp.int32)
    ohy = (yq[:, :, None] == iota).astype(jnp.int8)  # [N, C, S]
    ohx = (xq[:, :, None] == iota).astype(jnp.int8)
    rows = jnp.einsum(
        "ncy,nyx->ncx", ohy, canvas, preferred_element_type=jnp.int32
    ).astype(jnp.int8)  # row values are (p - 128): int8-exact
    return jnp.einsum(
        "ncx,ncx->nc", rows, ohx, preferred_element_type=jnp.int32
    )


def descend_canvas(
    chunk: Dict[str, jnp.ndarray],  # stacked cart params [C, ...]
    canvas: jnp.ndarray,  # [N, S, S] int8
    pw: jnp.ndarray,  # [N] int32 true patch width per lane (<= S)
    shapes: jnp.ndarray,  # [N, 2L] float32
    *,
    depth: int,
    rounding: bool,
    cart_block: int = 135,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Wide tree descent of C carts over N canvas lanes — the MXU twin of
    cascade.carts_descend (single-scale).  Returns (leaves [N, C],
    b [N, C] leaf scores).  cart_block bounds the [N, CB, S] one-hot
    temporaries."""
    C = chunk["feat_th"].shape[0]
    if C > cart_block:
        parts = [
            descend_canvas(
                {k: v[c0 : min(c0 + cart_block, C)] for k, v in chunk.items()},
                canvas,
                pw,
                shapes,
                depth=depth,
                rounding=rounding,
                cart_block=cart_block,
            )
            for c0 in range(0, C, cart_block)
        ]
        return (
            jnp.concatenate([p[0] for p in parts], axis=1),
            jnp.concatenate([p[1] for p in parts], axis=1),
        )

    shape_x = shapes[:, 0::2]  # [N, L]
    shape_y = shapes[:, 1::2]
    to_int = round_half_away if rounding else trunc_toward_zero
    pwc = pw[:, None]  # [N, 1]
    pwf = pwc.astype(jnp.float32)

    def node_value(j):
        def pt(lmk_col, off_col):
            px = _onehot_select(shape_x, lmk_col)  # [N, C]
            py = _onehot_select(shape_y, lmk_col)
            xq = jnp.clip(to_int((px + off_col[None, :, 0]) * pwf), 0, pwc - 1)
            yq = jnp.clip(to_int((py + off_col[None, :, 1]) * pwf), 0, pwc - 1)
            return _pix_mxu(canvas, xq, yq)

        v1 = pt(chunk["lmk1"][:, j], chunk["off1"][:, j])
        v2 = pt(chunk["lmk2"][:, j], chunk["off2"][:, j])
        return v1 - v2, jnp.broadcast_to(
            chunk["feat_th"][:, j][None, :], v1.shape
        )

    bits = []
    for r in range(depth - 1):
        cands = [node_value(j) for j in range((1 << r) - 1, (1 << (r + 1)) - 1)]
        v = _bit_select([c[0] for c in cands], bits)
        th = _bit_select([c[1] for c in cands], bits)
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


def run_cart_chunk_canvas(
    chunk: Dict[str, jnp.ndarray],
    canvas: jnp.ndarray,
    state: Dict[str, jnp.ndarray],  # needs shape/score/alive/nvis + pw [N]
    *,
    depth: int,
    rounding: bool,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Canvas twin of cascade.run_cart_chunk: wide descent + the exact
    sequential score/threshold chain (c/jda.c:395-399)."""
    leaves, b = descend_canvas(
        chunk, canvas, state["pw"], state["shape"], depth=depth,
        rounding=rounding,
    )
    score, alive, nvis = score_chain(
        b, chunk, state["score"], state["alive"], state["nvis"]
    )
    out = dict(state)
    out["score"], out["alive"], out["nvis"] = score, alive, nvis
    return out, leaves
