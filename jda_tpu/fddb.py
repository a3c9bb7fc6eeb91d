"""FDDB benchmark harness (`jda fddb`, /root/reference/src/test.cpp:73-235).

Runs the detector over the 10 FDDB folds and writes `fold-XX-out.txt`
result files in the rect format consumed by the standard FDDB evaluation
tools (README.md:115-136):

    <image path>
    <n detections>
    <x y w h score> * n

Statistics mirror DetectionStatisic aggregation (windows scanned / face /
non-face / mean carts to reject), per fold and overall.  The reference
parallelizes over folds with OpenMP (test.cpp:100); here each image's
windows are already a device batch, so folds run sequentially while the
TPU stays saturated (fold parallelism is just eval-set sharding —
SURVEY.md §2 P6).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np

from jda_tpu.config import Config
from jda_tpu.params import CascadeParams
from jda_tpu.cascador import CppDetector, DetectionStatistic
from jda_tpu.utils import log


def read_fold(fddb_dir: str, fold: int) -> List[str]:
    path = os.path.join(fddb_dir, "FDDB-folds", f"FDDB-fold-{fold:02d}.txt")
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def read_ellipses(fddb_dir: str, fold: int) -> Dict[str, np.ndarray]:
    """Ground-truth ellipses (major minor angle cx cy score per face)."""
    path = os.path.join(
        fddb_dir, "FDDB-folds", f"FDDB-fold-{fold:02d}-ellipseList.txt"
    )
    out: Dict[str, np.ndarray] = {}
    with open(path) as f:
        toks = f.read().split("\n")
    i = 0
    while i < len(toks):
        name = toks[i].strip()
        if not name:
            i += 1
            continue
        n = int(toks[i + 1])
        faces = [
            [float(v) for v in toks[i + 2 + j].split()] for j in range(n)
        ]
        out[name] = np.asarray(faces)
        i += 2 + n
    return out


def run_fddb(
    params: CascadeParams,
    c: Config,
    folds: Optional[List[int]] = None,
    out_dir: Optional[str] = None,
    annotate: bool = False,
) -> Dict:
    """Run the benchmark; returns aggregate stats + per-fold timings."""
    import cv2

    det = CppDetector(params, c)
    folds = folds or list(range(1, 11))
    out_dir = out_dir or os.path.join(c.fddb_dir, "result")
    os.makedirs(out_dir, exist_ok=True)
    prefix = os.path.join(c.fddb_dir, "images")

    # load every fold up front; images are the device batch axis (the
    # reference parallelizes the FOLD loop with OpenMP, test.cpp:100;
    # here each batch of images shares one fused cascade dispatch).  The
    # canonical plane is computed over the WHOLE sweep, not per fold —
    # folds with different max dims would otherwise each recompile the
    # fused plan (round 4 paid 881 s of compiles on fold 1 alone).
    by_fold = {}
    for i in folds:
        loaded = []
        for path in read_fold(c.fddb_dir, i):
            full = os.path.join(prefix, path + ".jpg")
            img = cv2.imread(full)
            if img is None:
                log(f"Can not open {full}, Skip it")
                continue
            loaded.append((path, img, cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)))
        by_fold[i] = loaded
    B = int(os.environ.get("JDA_TPU_FDDB_BATCH", "8"))
    canon = None
    if any(by_fold.values()):
        mh = max(g.shape[0] for ld in by_fold.values() for _, _, g in ld)
        mw = max(g.shape[1] for ld in by_fold.values() for _, _, g in ld)
        canon = (-(-mh // 128) * 128, -(-mw // 128) * 128)

    total_stat = DetectionStatistic()
    total_images = 0
    total_time = 0.0
    fold_stats = []
    for i in folds:
        log(f"Testing FDDB-fold-{i:02d}")
        fold_stat = DetectionStatistic()
        lines = []
        n_img = 0
        t_fold = 0.0
        gt = {}
        if annotate:
            try:
                gt = read_ellipses(c.fddb_dir, i)
            except OSError:
                gt = {}
        loaded = by_fold[i]
        batched_results = []
        import numpy as _np

        for b0 in range(0, len(loaded), B):
            grays = [g for _, _, g in loaded[b0 : b0 + B]]
            t0 = time.perf_counter()
            if (
                c.fddb_detect_method != 0
                and det.det.single_scale
                and det.det._fused_enabled()
                and len(loaded) > 1
            ):
                # pad the tail chunk so every batch reuses one compiled plan
                pad = B - len(grays)
                gg = grays + [_np.zeros((1, 1), _np.uint8)] * pad
                outs = det._detect_batch_m1(gg, canon=canon)[: len(grays)]
            else:
                outs = [det.detect(g) for g in grays]
            t_fold += time.perf_counter() - t0
            batched_results.extend(outs)
        for (path, img, gray), (rects, scores, shapes, stat) in zip(
            loaded, batched_results
        ):
            n_img += 1
            fold_stat.add(stat)
            lines.append(path)
            lines.append(str(len(rects)))
            for r, s in zip(rects, scores):
                # printf("%d %d %d %d %lf\n", ...) — test.cpp:163
                lines.append(f"{r[0]} {r[1]} {r[2]} {r[3]} {s:.6f}")
            if annotate:
                import math as _math

                for e in gt.get(path, []):
                    cv2.ellipse(
                        img,
                        (int(e[3]), int(e[4])),
                        (int(e[0]), int(e[1])),
                        e[2] / _math.pi * 180.0,
                        0.0,
                        360.0,
                        (255, 0, 0),
                        2,
                    )
                for r, s in zip(rects, scores):
                    cv2.rectangle(
                        img,
                        (int(r[0]), int(r[1])),
                        (int(r[0] + r[2]), int(r[1] + r[3])),
                        (0, 0, 255),
                        3,
                    )
                    if c.fddb_draw_score:  # test.cpp:191-194
                        cv2.putText(
                            img,
                            f"{s:.4f}",
                            (int(r[0]), int(r[1])),
                            cv2.FONT_HERSHEY_PLAIN,
                            1,
                            (0, 255, 0),
                            2,
                        )
                if c.fddb_draw_shape:  # test.cpp:196-200
                    for sh in shapes:
                        for k in range(len(sh) // 2):
                            cv2.circle(
                                img,
                                (int(sh[2 * k]), int(sh[2 * k + 1])),
                                3,
                                (0, 255, 0),
                                -1,
                            )
                cv2.imwrite(
                    os.path.join(
                        out_dir, f"{i:02d}_{n_img:03d}_{len(rects):02d}.jpg"
                    ),
                    img,
                )
        with open(os.path.join(out_dir, f"fold-{i:02d}-out.txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        log(
            f"fold {i:02d}: {n_img} images, {n_img / max(t_fold, 1e-9):.2f} "
            f"img/s; windows {fold_stat.patch_n}, faces "
            f"{fold_stat.face_patch_n}, avg reject carts "
            f"{fold_stat.average_cart_n:.2f}"
        )
        total_stat.add(fold_stat)
        total_images += n_img
        total_time += t_fold
        fold_stats.append(
            {"fold": i, "images": n_img, "seconds": t_fold}
        )

    log(
        f"ALL: {total_images} images in {total_time:.1f}s "
        f"({total_images / max(total_time, 1e-9):.2f} img/s); windows "
        f"{total_stat.patch_n}, avg reject carts {total_stat.average_cart_n:.2f}"
    )
    return {
        "images": total_images,
        "seconds": total_time,
        "images_per_sec": total_images / max(total_time, 1e-9),
        "windows": total_stat.patch_n,
        "face_windows": total_stat.face_patch_n,
        "average_cart_n": total_stat.average_cart_n,
        "folds": fold_stats,
    }
