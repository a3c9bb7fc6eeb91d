"""On-TPU validation of the pallas canvas-extraction kernel.

1. Kernel-level: canvas_pallas vs the jnp.take reference on every
   in-bounds pixel (padding beyond each lane's true window is never read
   and may differ).
2. Detector-level: full fused-v2 detection with JDA_TPU_CANVAS=pallas must
   be bit-identical to canvas=gather (rects, scores, shapes).

Run: python scripts/validate_canvas_pallas.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", "requires the TPU chip"
    from jda_tpu import params as P
    from jda_tpu.detect import Detector
    from jda_tpu.ops import canvas_pallas as CP
    from jda_tpu.ops import mxu_tail as MT

    rng = np.random.default_rng(23)

    # -- kernel level, every bucket size --------------------------------
    for S, (B, H, W, N) in {
        32: (3, 120, 160, 500),
        64: (2, 200, 320, 300),
        128: (2, 300, 400, 130),
        256: (1, 480, 640, 70),
    }.items():
        imgs = rng.integers(0, 256, (B, H, W)).astype(np.int32)
        win = rng.integers(max(24, S // 2), S + 1, N).astype(np.int32)
        b_idx = rng.integers(0, B, N).astype(np.int32)
        x = (rng.random(N) * (W - win)).astype(np.int32)
        y = (rng.random(N) * (H - win)).astype(np.int32)
        ref = np.asarray(
            MT.canvas_from_windows(
                jnp.asarray(imgs.reshape(-1)),
                jnp.asarray(b_idx),
                jnp.asarray(x),
                jnp.asarray(y),
                H,
                W,
                S,
            )
        )
        got = np.asarray(
            CP.canvas_pallas(
                CP.pad_images(jnp.asarray(imgs), S),
                jnp.asarray(b_idx),
                jnp.asarray(x),
                jnp.asarray(y),
                S,
            )
        )
        bad = 0
        for n in range(N):
            w = int(win[n])
            if not np.array_equal(ref[n, :w, :w], got[n, :w, :w]):
                bad += 1
        assert bad == 0, f"S={S}: {bad}/{N} lanes mismatch"
        print(f"S={S:3d}: {N} lanes exact")

    # -- detector level -------------------------------------------------
    m = P.synthetic_model(
        T=3, K=24, landmark_n=9, tree_depth=4, seed=4, reject_rate=0.3
    )
    grays = [
        rng.integers(0, 256, (300, 400)).astype(np.uint8),
        rng.integers(0, 256, (280, 360)).astype(np.uint8),
    ]
    outs = {}
    for mode in ("gather", "pallas"):
        os.environ["JDA_TPU_CANVAS"] = mode
        try:
            outs[mode] = Detector(m).detect_batch(grays, th=-5.0)
        finally:
            os.environ.pop("JDA_TPU_CANVAS", None)
    total = 0
    for r, v in zip(outs["gather"], outs["pallas"]):
        assert r.n == v.n
        np.testing.assert_array_equal(r.bboxes, v.bboxes)
        np.testing.assert_array_equal(r.scores, v.scores)
        np.testing.assert_array_equal(r.shapes, v.shapes)
        total += r.n
    print(f"detector parity: {total} detections bit-identical")


if __name__ == "__main__":
    main()
