"""1080p single-frame latency + streaming FPS (the live-config shape).

The reference's live config runs a growing-window scan over full frames
(/root/reference/src/live.cpp:11-52, BASELINE.json config 4).  This
measures the same workload on TPU: a flagship-geometry cascade over
1920x1080 frames, end-to-end (pyramid ladder, dense stage-0, survivor
tail, NMS), both as single-frame latency (B=1, the interactive shape) and
as pipelined streaming throughput (detect_stream, the camera-feed shape).

Env knobs for A/B: JDA_TPU_TAIL (mxu|gather), JDA_TPU_CANVAS
(gather|rows), B1080_BATCH, B1080_FRAMES.

Prints one JSON line with sec/frame (median), stream fps, and the ladder's
window count.
"""

import json
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
    from jda_tpu import params as P
    from jda_tpu.detect import Detector, enumerate_windows
    from bench import make_image

    H, W = 1080, 1920
    BATCH = int(os.environ.get("B1080_BATCH", "2"))
    FRAMES = int(os.environ.get("B1080_FRAMES", str(4 * BATCH)))
    kw = dict(scale=1.25, min_size=24, max_size=-1, th=-0.5)

    model = P.synthetic_model(
        T=5,
        K=540,
        landmark_n=27,
        seed=7,
        drop_profile=P.realistic_drop_profile(5, 540),
    )
    frames = [make_image(H, W, seed=31 + i) for i in range(FRAMES)]
    windows = len(enumerate_windows(W, H, kw["scale"], kw["min_size"], H)[0])

    det = Detector(model)

    # single-frame latency (B=1): warm once, then median of 5
    det.detect_batch(frames[:1], **kw)
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        det.detect_batch([frames[i % FRAMES]], **kw)
        lat.append(time.perf_counter() - t0)

    # streaming (1-deep pipelined chunks of BATCH)
    det2 = Detector(model)
    det2.detect_stream(frames[: 2 * BATCH], batch=BATCH, **kw)  # warm
    t0 = time.perf_counter()
    det2.detect_stream(frames, batch=BATCH, **kw)
    stream_s = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "1080p detect",
                "sec_per_frame_b1": round(float(np.median(lat)), 3),
                "lat_runs": [round(v, 3) for v in lat],
                "stream_fps": round(FRAMES / stream_s, 3),
                "batch": BATCH,
                "frames": FRAMES,
                "windows_per_frame": windows,
                "windows_per_sec_stream": round(
                    windows * FRAMES / stream_s, 1
                ),
                # report the detector's actual defaults (detect.py
                # _mxu_tail_enabled / _canvas_mode)
                "tail": os.environ.get("JDA_TPU_TAIL", "gather"),
                "canvas": os.environ.get("JDA_TPU_CANVAS", "rows"),
            }
        )
    )


if __name__ == "__main__":
    main()
