"""Parity + timing for the round-3 dense-filter rework: pre-rolled-planes
Pallas kernel (big grids) and static-slice unroll (small grids) vs the
pure-XLA scan reference, on the real chip, full VGA ladder.

Prints per-scale parity (must be EXACT: same crops, same f32 score chain)
and the ladder timing old-mixed vs new-mixed.

Usage: PYTHONPATH=. python scripts/validate_dense_v2.py [B]
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    H, W = 480, 640
    model = P.synthetic_model(
        T=5, K=540, landmark_n=27, seed=7,
        drop_profile=P.realistic_drop_profile(5, 540),
    )
    det = Detector(model)
    _, _, _, scales = enumerate_windows(W, H, 1.25, 24, min(H, W))
    depth = det.depth
    node_n = (1 << (depth - 1)) - 1
    meta = tuple(scales)
    tabs_host = tuple(
        D0.node_tables(det._ms32, det._host_stage0, w_, s_,
                       rounding=det.rounding)
        for (w_, s_, ny, nx) in scales
    )
    mixed = D0.mixed_tables(tabs_host, meta, node_n)
    xla_tabs = tuple(
        {k: jnp.asarray(v) for k, v in t.items()} for t in tabs_host
    )
    imgs = jnp.asarray(
        np.stack([make_image(H, W, seed=3 + i) for i in range(B)])
    ).astype(jnp.int32)

    @jax.jit
    def ref(im):
        return D0.stage0_filter_all_scales(im, xla_tabs, meta=meta,
                                           depth=depth)

    @jax.jit
    def new(im):
        return D0.stage0_filter_mixed(im, mixed, meta=meta, depth=depth,
                                      static_tabs=tabs_host)

    @jax.jit
    def old(im):
        return D0.stage0_filter_mixed(im, mixed, meta=meta, depth=depth)

    print("compiling ref...", flush=True)
    r = ref(imgs)
    print("compiling new mixed...", flush=True)
    os.environ["JDA_TPU_DENSE_ROLLED"] = "1"  # routing read at trace time
    n = new(imgs)
    rs, ra, rn = (np.asarray(v) for v in r)
    ns, na, nn = (np.asarray(v) for v in n)
    off = 0
    ok_all = True
    for (w_, s_, ny, nx) in scales:
        g = ny * nx
        sl = slice(off, off + g)
        ok = (
            np.array_equal(ra[:, sl], na[:, sl])
            and np.array_equal(rn[:, sl], nn[:, sl])
            and np.array_equal(rs[:, sl], ns[:, sl])
        )
        ok_all &= ok
        geom = D0._resident_geom(H, W, w_, s_, ny, nx)
        kind = (
            "static" if geom is None and g <= D0.STATIC_MAX_WINDOWS
            else "xla" if geom is None
            else "tiled" if geom["ctile"] is not None
            else "rolled" if D0._rolled_fits(geom)
            else "resident"
        )
        print(f"win={w_:<4} kind={kind:<9} parity={'OK' if ok else 'FAIL'}")
        off += g
    print("ALL PARITY", "OK" if ok_all else "FAIL")
    print("compiling old mixed...", flush=True)
    os.environ["JDA_TPU_DENSE_ROLLED"] = "0"  # old = plain resident kernel
    old(imgs)
    os.environ["JDA_TPU_DENSE_ROLLED"] = "1"
    t_new = t_min(lambda: new(imgs))
    t_old = t_min(lambda: old(imgs))
    t_ref = t_min(lambda: ref(imgs))
    print(f"B={B} ladder:  xla-scan {t_ref*1000:.1f} ms   "
          f"old-mixed {t_old*1000:.1f} ms   new-mixed {t_new*1000:.1f} ms")


if __name__ == "__main__":
    main()
