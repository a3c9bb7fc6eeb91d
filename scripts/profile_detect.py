"""Phase breakdown of the fused VGA detection pipeline.

Times, on the real chip (warm cache), for a B-image VGA batch:
  1. steady-state streaming images/sec (the bench number)
  2. one warm fused dispatch (np.asarray-forced; the relay's
     block_until_ready does not block)
  3. the dense stage-0 filter alone (same tables/plan)
  4. the image upload alone (device_put of the uint8 batch)
  5. inferred survivor-tail cost = (2) - (3) - dispatch floor
plus the true per-compaction survivor counts vs the static budgets (how
much tail slack the budget ladder carries).

Usage: PYTHONPATH=. python scripts/profile_detect.py [B] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t_once(fn):
    t0 = time.perf_counter()
    out = fn()
    # force materialization (relay's block_until_ready does not block)
    vals = (
        out.values() if isinstance(out, dict)
        else out if isinstance(out, (tuple, list))
        else [out]
    )
    for v in vals:
        np.asarray(v)
    return time.perf_counter() - t0


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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    H, W = 480, 640
    kw = dict(scale=1.25, min_size=24, max_size=-1, th=-0.5)

    model = P.synthetic_model(
        T=5, K=540, landmark_n=27, seed=7,
        drop_profile=P.realistic_drop_profile(5, 540),
    )
    det = Detector(model)
    imgs = [make_image(H, W, seed=3 + i) for i in range(B * 8)]

    # warm everything
    det.detect_stream(imgs[: 2 * B], batch=B, **kw)

    # 1. steady-state streaming
    t0 = time.perf_counter()
    det.detect_stream(imgs, batch=B, **kw)
    stream_ips = len(imgs) / (time.perf_counter() - t0)

    # grab the compiled plan the stream used (same key as detect_stream)
    plan = det._fused_plan(B, H, W, kw["scale"], kw["min_size"], min(H, W))
    batch = np.stack(imgs[:B])
    dims = np.tile(np.asarray([[W, H]], np.int32), (B, 1))

    # 2. one fused dispatch, warm
    up = jnp.asarray(batch)  # resident input: isolates compute from upload
    dims_d = jnp.asarray(dims)

    def fused_once():
        return plan["fn"](det.dev, up, dims_d, plan["tabs"], plan["xywin"])

    fused_s = min(t_once(fused_once) for _ in range(reps))
    out = fused_once()
    counts = np.asarray(out["counts"])

    # 3. dense stage-0 alone (jit over the same tables)
    meta = plan["scales"]
    depth = det.depth

    # exactly the dense program the fused plan runs (static_tabs + s0_lbf)
    s0_lbf = det._s0_lbf_enabled()

    @jax.jit
    def dense_only(imgs_dev, tabs):
        out = D0.stage0_filter_mixed(
            imgs_dev.astype(jnp.int32), tabs, meta=meta, depth=depth,
            static_tabs=plan.get("static_tabs"), emit_lbf=s0_lbf,
        ) if plan.get("use_pallas") else D0.stage0_filter_all_scales(
            imgs_dev.astype(jnp.int32), tabs, meta=meta, depth=depth,
            emit_lbf=s0_lbf,
        )
        # scalar summaries: time compute, not a ~100 MB relay download
        return tuple(jnp.sum(v.astype(jnp.int64) if v.dtype != jnp.float32
                             else v) for v in out)

    dense_only(up, plan["tabs"])  # compile
    dense_s = min(t_once(lambda: dense_only(up, plan["tabs"])) for _ in range(reps))

    # 4. upload alone
    def upload():
        return jax.device_put(batch)

    upload_s = min(t_once(upload) for _ in range(reps))

    # 5. dispatch floor: trivial jit call on resident data
    @jax.jit
    def nop(x):
        return x + 1

    nop(up)
    floor_s = min(t_once(lambda: nop(up)) for _ in range(reps))

    budgets = plan["budgets"]
    print(f"B={B} VGA  plan windows/img={plan['xywin'].shape[0]}")
    print(f"steady-state streaming : {stream_ips:.2f} img/s "
          f"({B/stream_ips*1000:.0f} ms/batch equivalent)")
    print(f"fused dispatch (warm)  : {fused_s*1000:.1f} ms/batch")
    print(f"  dense stage-0 alone  : {dense_s*1000:.1f} ms")
    print(f"  inferred tail+compact: {(fused_s-dense_s)*1000:.1f} ms")
    print(f"image upload (u8)      : {upload_s*1000:.1f} ms "
          f"({batch.nbytes/1e6:.1f} MB)")
    print(f"dispatch floor         : {floor_s*1000:.1f} ms")
    print(f"budgets: {list(budgets)}")
    print(f"counts : {counts.tolist()}")
    slack = [b - int(c) for b, c in zip(budgets, counts.tolist())]
    print(f"slack  : {slack}")


if __name__ == "__main__":
    main()
