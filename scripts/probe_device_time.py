"""True device-time probe for the fused VGA program.

The relay charges ~120 ms per forced round trip, so single-dispatch wall
times (profile_detect.py) conflate device compute with relay latency.  This
probe dispatches the same program N times back-to-back (async, nothing
forced until the end): total ~= N * device_time + 1 RTT, so the slope is
the true per-batch device cost.  Also probes the dense filter alone the
same way, upload bandwidth, and the effect of B and budget tightness.

Usage: PYTHONPATH=. python scripts/probe_device_time.py [B] [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    from jda_tpu.detect import Detector
    from jda_tpu.ops import dense0 as D0

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    H, W = 480, 640
    kw = dict(scale=1.25, min_size=24, max_size=-1, th=-0.5)

    model = P.synthetic_model(
        T=5, K=540, landmark_n=27, seed=7,
        drop_profile=P.realistic_drop_profile(5, 540),
    )
    det = Detector(model)
    imgs = [make_image(H, W, seed=3 + i) for i in range(B)]
    det.detect_stream(imgs * 2, batch=B, **kw)  # warm

    plan = det._fused_plan(B, H, W, kw["scale"], kw["min_size"], min(H, W))
    batch = np.stack(imgs)
    dims = np.tile(np.asarray([[W, H]], np.int32), (B, 1))
    up = jnp.asarray(batch)
    dims_d = jnp.asarray(dims)
    np.asarray(up)  # settle

    # N async dispatches, force only the last scalar
    def chain(n):
        t0 = time.perf_counter()
        outs = []
        for _ in range(n):
            o = plan["fn"](det.dev, up, dims_d, plan["tabs"], plan["xywin"])
            outs.append(o)
        for o in outs:
            np.asarray(o["counts"])  # tiny download per dispatch
        return time.perf_counter() - t0

    t1 = chain(1)
    tN = chain(N)
    dev_per = (tN - t1) / (N - 1)
    print(f"B={B} fused: 1-shot {t1*1e3:.1f} ms, {N}-chain {tN*1e3:.1f} ms "
          f"-> device/batch ~{dev_per*1e3:.1f} ms "
          f"({B/dev_per:.1f} img/s device-bound ceiling)")

    # dense alone, same protocol
    meta = plan["scales"]
    s0_lbf = det._s0_lbf_enabled()

    @jax.jit
    def dense_only(imgs_dev, tabs):
        out = D0.stage0_filter_mixed(
            imgs_dev.astype(jnp.int32), tabs, meta=meta, depth=det.depth,
            static_tabs=plan.get("static_tabs"), emit_lbf=s0_lbf,
        ) if plan.get("use_pallas") else D0.stage0_filter_all_scales(
            imgs_dev.astype(jnp.int32), tabs, meta=meta, depth=det.depth,
            emit_lbf=s0_lbf,
        )
        return jnp.sum(out[0]) + jnp.sum(out[1])

    dense_only(up, plan["tabs"])

    def chain_d(n):
        t0 = time.perf_counter()
        outs = [dense_only(up, plan["tabs"]) for _ in range(n)]
        for o in outs:
            np.asarray(o)
        return time.perf_counter() - t0

    t1d = chain_d(1)
    tNd = chain_d(N)
    dd = (tNd - t1d) / (N - 1)
    print(f"  dense/batch ~{dd*1e3:.1f} ms; tail+compact ~{(dev_per-dd)*1e3:.1f} ms")

    # upload: is it pipelined? time N device_puts of distinct arrays
    bufs = [np.stack([make_image(H, W, seed=100 + i * B + j) for j in range(B)])
            for i in range(N)]
    t0 = time.perf_counter()
    handles = [jax.device_put(b) for b in bufs]
    for h in handles:
        h.block_until_ready()
    # force one byte back to ensure completion
    np.asarray(handles[-1][0, 0, :8])
    t_up = (time.perf_counter() - t0) / N
    print(f"  upload/batch ~{t_up*1e3:.1f} ms ({bufs[0].nbytes/1e6:.2f} MB, "
          f"{bufs[0].nbytes/t_up/1e6:.1f} MB/s)")


if __name__ == "__main__":
    main()
