"""Detection throughput benchmark: TPU detector vs reference single core.

Measures end-to-end `detect` (pyramid + window enumeration + full cascade +
NMS + landmark relocation) on a VGA image with a flagship-geometry model
(T=5, K=540, 27 landmarks, depth 4 — /root/reference/c/jda.c:24-32).  The
baseline is the reference C library (c/jda.c) compiled locally and run
single-core on this machine's CPU, per BASELINE.md (the reference publishes
no absolute numbers).  Both sides run the same synthetic model (the shipped
trained blob was stripped from the snapshot) with realistic per-cart early
rejection, the same image, and identical detect parameters.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_image(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h // 8 + 2, w // 8 + 2)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), np.float32))[:h, :w]
    noise = rng.normal(0, 12, (h, w))
    return np.clip(img + noise, 0, 255).astype(np.uint8)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    from jda_tpu import params as P
    from jda_tpu.detect import Detector
    from jda_tpu import oracle

    H, W = 480, 640
    # B=16 is the round-5 sweet spot on the v5e tunnel: 25.8 img/s vs
    # 22.7 (B=8, compute-amortization limited) and 23.5 (B=32, upload-
    # bound at ~13 MB/s host->device)
    BATCH = int(os.environ.get("BENCH_BATCH", "16"))
    NCHUNK = int(os.environ.get("BENCH_CHUNKS", "4"))
    REPS = int(os.environ.get("BENCH_REPS", "3"))
    kw = dict(scale=1.25, min_size=24, max_size=-1, th=-0.5)

    model = P.synthetic_model(
        T=5,
        K=540,
        landmark_n=27,
        seed=7,
        drop_profile=P.realistic_drop_profile(5, 540),
    )
    imgs = [make_image(H, W, seed=3 + i) for i in range(BATCH * NCHUNK)]

    from jda_tpu.detect import enumerate_windows

    # max_size=-1 means "up to the image" (c/jda.c:322-326); translate
    # before enumerating, as Detector.detect does
    windows_per_img = len(
        enumerate_windows(W, H, kw["scale"], kw["min_size"], min(H, W))[0]
    )

    det = Detector(model)
    det.detect_stream(imgs[: 2 * BATCH], batch=BATCH, **kw)  # warm/compile

    orc = None
    tmp_dir = None
    if oracle.available():
        import tempfile

        tmp_dir = tempfile.TemporaryDirectory()
        mp = os.path.join(tmp_dir.name, "bench.model")
        P.save_model(model, mp, dtype="double")
        orc = oracle.Oracle(mp, dtype="double")
        orc.detect(imgs[0], **kw)  # warmup/IO

    # pinned protocol: REPS interleaved (ours, reference) measurements,
    # MEDIAN of each — round-over-round vs_baseline ratios stay meaningful
    # under machine-load swings (a best-of ratio does not).  Ours runs
    # chunks of BATCH through the 1-deep pipeline (upload of chunk i
    # overlaps compute of chunk i-1 — the production serving shape).
    ours_runs, ref_runs = [], []
    n_ref = max(2, BATCH // 2)
    for _ in range(REPS):
        t0 = time.perf_counter()
        det.detect_stream(imgs, batch=BATCH, **kw)
        ours_runs.append(len(imgs) / (time.perf_counter() - t0))
        if orc is not None:
            t0 = time.perf_counter()
            for img in imgs[:n_ref]:
                orc.detect(img, **kw)
            ref_runs.append(n_ref / (time.perf_counter() - t0))
    if tmp_dir is not None:
        del orc
        tmp_dir.cleanup()

    ours_ips = float(np.median(ours_runs))
    vs = None
    ref_ips = None
    if ref_runs:
        ref_ips = float(np.median(ref_runs))
        vs = ours_ips / ref_ips

    # 1080p streaming (BASELINE config 4, the live shape) on the same
    # detector/model — captured here so the driver records it in
    # BENCH_r*.json instead of PERF.md prose.  Small frame count: the
    # metric is warm streaming FPS, compile rides the jit cache.
    p1080 = {}
    if os.environ.get("BENCH_1080", "1") != "0":
        try:
            Hh, Ww = 1080, 1920
            B2 = int(os.environ.get("BENCH_1080_BATCH", "4"))
            n_f = 4 * B2
            frames = [make_image(Hh, Ww, seed=31 + i) for i in range(n_f)]
            w1080 = len(
                enumerate_windows(Ww, Hh, kw["scale"], kw["min_size"], Hh)[0]
            )
            det.detect_stream(frames[: 2 * B2], batch=B2, **kw)  # warm
            t0 = time.perf_counter()
            det.detect_stream(frames, batch=B2, **kw)
            s1080 = time.perf_counter() - t0
            p1080 = {
                "p1080_stream_fps": round(n_f / s1080, 3),
                "p1080_windows_per_frame": w1080,
                "p1080_windows_per_sec": round(w1080 * n_f / s1080, 1),
            }
        except Exception as e:  # never let the live shape sink the bench
            p1080 = {"p1080_error": repr(e)}

    print(
        json.dumps(
            {
                "metric": "VGA images/sec, full detect (synthetic T=5 K=540 cascade)",
                "value": round(ours_ips, 3),
                "unit": "images/sec",
                "vs_baseline": round(vs, 3) if vs is not None else None,
                "windows_per_image": windows_per_img,
                "windows_per_sec": round(ours_ips * windows_per_img, 1),
                "runs_images_per_sec": [round(v, 3) for v in ours_runs],
                "ref_runs_images_per_sec": [round(v, 3) for v in ref_runs],
                **p1080,
            }
        )
    )


if __name__ == "__main__":
    main()
