"""Per-scale timing of the dense stage-0 filter, XLA scan vs Pallas.

For every scale of the VGA ladder (B=8 by default): time the XLA blocked
scan (_scale_filter) and the mixed Pallas dispatch (resident / tiled /
fallback as stage0_filter_mixed picks it), print ms per scale and the
ladder totals.  This tells us WHERE the dense wall lives — the filter is
~81% of the fused VGA dispatch (scripts/profile_detect.py).

Usage: PYTHONPATH=. python scripts/profile_dense.py [B] [H] [W]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t_min(fn, reps=5):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        for v in out:
            np.asarray(v)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    import jax.numpy as jnp

    from bench import make_image
    from jda_tpu import params as P
    from jda_tpu.detect import Detector, enumerate_windows
    from jda_tpu.ops import dense0 as D0

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 640

    model = P.synthetic_model(
        T=5, K=540, landmark_n=27, seed=7,
        drop_profile=P.realistic_drop_profile(5, 540),
    )
    det = Detector(model)
    x, y, win, scales = enumerate_windows(W, H, 1.25, 24, min(H, W))
    st_host = det._host_stage0
    ms = det._ms32
    depth = det.depth
    node_n = (1 << (depth - 1)) - 1

    imgs = jnp.asarray(
        np.stack([make_image(H, W, seed=3 + i) for i in range(B)])
    ).astype(jnp.int32)

    tot_x = tot_p = 0.0
    print(f"B={B} {W}x{H}  scales={len(scales)}")
    print(f"{'win':>5} {'step':>4} {'grid':>12} {'kind':>9} "
          f"{'xla ms':>8} {'pallas ms':>10}")
    for (w_, s_, ny, nx) in scales:
        tab = D0.node_tables(ms, st_host, w_, s_, rounding=det.rounding)
        tabd = {k: jnp.asarray(v) for k, v in tab.items()}
        mixed = D0.mixed_tables((tab,), ((w_, s_, ny, nx),), node_n)

        @jax.jit
        def xla_one(im, t=tabd, s=s_, ny=ny, nx=nx):
            return D0._scale_filter(im, t, step=s, ny=ny, nx=nx, depth=depth)

        @jax.jit
        def pl_one(im, t=mixed, meta=((w_, s_, ny, nx),)):
            return D0.stage0_filter_mixed(im, t, meta=meta, depth=depth)

        geom = D0._resident_geom(H, W, w_, s_, ny, nx)
        kind = (
            "xla-fb" if geom is None
            else ("tiled" if geom["ctile"] is not None else "resident")
        )
        xla_one(imgs)
        pl_one(imgs)
        tx = t_min(lambda: xla_one(imgs))
        tp = t_min(lambda: pl_one(imgs))
        tot_x += tx
        tot_p += tp
        print(f"{w_:>5} {s_:>4} {ny:>5}x{nx:<6} {kind:>9} "
              f"{tx*1000:>8.1f} {tp*1000:>10.1f}")
    print(f"{'':>29}total {tot_x*1000:>8.1f} {tot_p*1000:>10.1f}")


if __name__ == "__main__":
    main()
