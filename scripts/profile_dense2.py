"""Decompose the fused dense-ladder cost: pallas scales vs XLA-fallback
scales, and the XLA fallback's CART_BLOCK sensitivity — all inside single
dispatches so the relay floor is paid once per measurement.

Usage: PYTHONPATH=. python scripts/profile_dense2.py [B]
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
    H, W = 480, 640

    model = P.synthetic_model(
        T=5, K=540, landmark_n=27, seed=7,
        drop_profile=P.realistic_drop_profile(5, 540),
    )
    det = Detector(model)
    _, _, _, scales = enumerate_windows(W, H, 1.25, 24, min(H, W))
    depth = det.depth
    node_n = (1 << (depth - 1)) - 1

    tabs_raw = [
        D0.node_tables(det._ms32, det._host_stage0, w_, s_,
                       rounding=det.rounding)
        for (w_, s_, ny, nx) in scales
    ]
    imgs = jnp.asarray(
        np.stack([make_image(H, W, seed=3 + i) for i in range(B)])
    ).astype(jnp.int32)

    pall, xfb = [], []
    for sc, tab in zip(scales, tabs_raw):
        geom = D0._resident_geom(H, W, *sc)
        (pall if geom is not None else xfb).append((sc, tab))

    def build(mix):
        meta = tuple(sc for sc, _ in mix)
        tabs = D0.mixed_tables(tuple(t for _, t in mix), meta, node_n)

        @jax.jit
        def f(im):
            return D0.stage0_filter_mixed(im, tabs, meta=meta, depth=depth)

        f(imgs)
        return lambda: f(imgs)

    def build_xla(mix):
        meta = tuple(sc for sc, _ in mix)
        tabs = tuple(
            {k: jnp.asarray(v) for k, v in t.items()} for _, t in mix
        )

        @jax.jit
        def f(im):
            return D0.stage0_filter_all_scales(im, tabs, meta=meta,
                                               depth=depth)

        f(imgs)
        return lambda: f(imgs)

    full = build(pall + xfb)
    p_only = build(pall)
    x_only = build(xfb)
    print(f"B={B}  pallas scales={len(pall)}  xla-fb scales={len(xfb)}")
    print(f"full mixed ladder : {t_min(full)*1000:.1f} ms")
    print(f"pallas scales only: {t_min(p_only)*1000:.1f} ms")
    print(f"xla-fb scales only: {t_min(x_only)*1000:.1f} ms")

    for cb in (12, 60, 135):
        D0.CART_BLOCK = cb
        xf = build_xla(xfb)
        print(f"xla-fb only, CART_BLOCK={cb:>3}: {t_min(xf)*1000:.1f} ms")
    D0.CART_BLOCK = 12
    # and the big pallas scale alone, for the compute floor
    p24 = build(pall[:1])
    print(f"win24 pallas alone: {t_min(p24)*1000:.1f} ms")


if __name__ == "__main__":
    main()
