"""Pallas canvas extraction: survivor windows HBM -> [N, S, S] via DMA.

The MXU survivor tail (ops/mxu_tail.py) needs each surviving window's
pixels resident as a per-lane canvas.  Materializing them with jnp.take
pays the XLA element-gather wall (~100-130 M elem/s, PERF.md microbench) —
at 1080p survivor populations that is hundreds of ms per frame, more than
the whole dense filter.  A window is just a strided 2D block of the image,
which is exactly what the TPU's DMA engines move at HBM bandwidth: this
kernel issues one aligned 2D copy per surviving lane (LB lanes per grid
step, copies for the whole block launched before the first wait so the
DMAs overlap), then applies the sub-tile residual shift in VMEM with
pltpu.roll — the same align-then-shift recipe as the dense stage-0 kernel
(ops/dense0.py:213-218).

Alignment: Mosaic requires DMA offsets/shapes tile-aligned in the last two
dims (8 sublanes x 128 lanes for int32).  Row starts are rounded down to
8, column starts to 128, and the copy block is (S + 8) x (ceil((S+128)/
128)*128); the caller pads the image batch (pad_images) so every aligned
block stays in bounds.  Padding content is never read: tree-node
coordinates clamp to each lane's true window size (< S).

Semantics match mxu_tail.canvas_from_windows for every in-bounds pixel;
only never-read canvas padding (j >= win) can differ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _blocks(S: int):
    """(NYB, NXB, LB): DMA block dims + lanes per grid step (VMEM-bounded)."""
    NYB = S + 8
    NXB = -(-(S + 128) // 128) * 128
    LB = {32: 32, 64: 16, 128: 8, 256: 4}.get(S, max(1, 1024 // S))
    return NYB, NXB, LB


def pad_images(imgs: jnp.ndarray, S_max: int) -> jnp.ndarray:
    """Pad [B, H, W] so every aligned DMA block for buckets <= S_max stays
    in bounds.  One pad serves all canvas groups of a fused program."""
    B, H, W = imgs.shape
    NYB, NXB, _ = _blocks(S_max)
    Hp = -(-H // 8) * 8 + NYB
    Wp = -(-W // 128) * 128 + NXB
    return jnp.pad(imgs, ((0, 0), (0, Hp - H), (0, Wp - W)))


@functools.partial(jax.jit, static_argnames=("S",))
def canvas_pallas(
    imgs_pad: jnp.ndarray,  # [B, Hp, Wp] int32 (pad_images output)
    b_idx: jnp.ndarray,  # [N] int32 image index per lane
    x: jnp.ndarray,  # [N] int32 window origin (unpadded coords)
    y: jnp.ndarray,  # [N] int32
    S: int,
) -> jnp.ndarray:
    """[N, S, S] int8 canvas (pixel - 128) via per-lane 2D DMA."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = b_idx.shape[0]
    NYB, NXB, LB = _blocks(S)
    n_steps = -(-N // LB)
    Np = n_steps * LB
    if Np != N:
        pad = (0, Np - N)
        b_idx = jnp.pad(b_idx, pad)
        x = jnp.pad(x, pad)
        y = jnp.pad(y, pad)
    tab = jnp.stack([b_idx, y, x], axis=1).astype(jnp.int32)  # [Np, 3]

    def kernel(tab_ref, img_ref, out_ref):
        # tab rides SMEM as ONE full-shape block (Mosaic rejects blocked
        # SMEM specs whose trailing dims aren't (8,128)-divisible); each
        # grid step indexes its LB rows by program id, like the dense
        # kernels (ops/dense0.py:316-328).
        g0 = pl.program_id(0) * LB

        def body(bufs, sems):
            for l in range(LB):
                yl = tab_ref[g0 + l, 1]
                xl = tab_ref[g0 + l, 2]
                y_al = pl.multiple_of((yl // 8) * 8, 8)
                x_al = pl.multiple_of((xl // 128) * 128, 128)
                pltpu.make_async_copy(
                    img_ref.at[
                        tab_ref[g0 + l, 0], pl.ds(y_al, NYB), pl.ds(x_al, NXB)
                    ],
                    bufs.at[l],
                    sems.at[l],
                ).start()
            for l in range(LB):
                pltpu.make_async_copy(
                    img_ref.at[0, pl.ds(0, NYB), pl.ds(0, NXB)],
                    bufs.at[l],
                    sems.at[l],
                ).wait()
                ru = tab_ref[g0 + l, 1] - (tab_ref[g0 + l, 1] // 8) * 8
                rv = tab_ref[g0 + l, 2] - (tab_ref[g0 + l, 2] // 128) * 128
                buf = bufs[l]
                rows = pltpu.roll(buf, (NYB - ru) % NYB, 0)[:S, :]
                vals = pltpu.roll(rows, (NXB - rv) % NXB, 1)[:, :S]
                out_ref[l] = vals - 128

        pl.run_scoped(
            body,
            bufs=pltpu.VMEM((LB, NYB, NXB), jnp.int32),
            sems=pltpu.SemaphoreType.DMA((LB,)),
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(tab.shape, lambda g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (LB, S, S), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Np, S, S), jnp.int32),
    )(tab, imgs_pad)
    return out[:N].astype(jnp.int8)
