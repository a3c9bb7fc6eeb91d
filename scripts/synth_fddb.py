"""FDDB-harness end-to-end artifact on synthetic scenes.

FDDB's images are absent from this environment, so this composes synthetic
scenes (same generator as scripts/eval_synth_scenes.py — faces from the
flagship model's training distribution placed into textured backgrounds)
into the exact FDDB directory layout the reference consumes
(/root/reference/src/test.cpp:73-235):

    <dir>/images/synth/fold_FF/img_NNN.jpg
    <dir>/FDDB-folds/FDDB-fold-FF.txt
    <dir>/FDDB-folds/FDDB-fold-FF-ellipseList.txt

then runs the full `jda fddb` harness (jda_tpu.fddb.run_fddb — batched
device detection per fold, fold-FF-out.txt in the rect format of
test.cpp:153,163) and scores a discROC-style sweep (TP@IoU-0.5 vs total
FP) from the fold outputs against the ellipse ground truth, like the
standard FDDB evaluation would.

Usage:
  PYTHONPATH=. python scripts/synth_fddb.py models/flagship_synth.model \
      [--dir data/fddb_synth] [--folds 2] [--scenes 24]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tree(root: str, folds: int, scenes_per_fold: int, seed: int = 123):
    import cv2

    from scripts.eval_synth_scenes import build_scenes

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "FDDB-folds"), exist_ok=True)
    for f in range(1, folds + 1):
        scenes, gt = build_scenes(rng, scenes_per_fold)
        img_dir = os.path.join(root, "images", "synth", f"fold_{f:02d}")
        os.makedirs(img_dir, exist_ok=True)
        names, ell_lines = [], []
        for i, (scene, (boxes, _lms)) in enumerate(zip(scenes, gt)):
            name = f"synth/fold_{f:02d}/img_{i:03d}"
            cv2.imwrite(os.path.join(root, "images", name + ".jpg"), scene)
            names.append(name)
            ell_lines.append(name)
            ell_lines.append(str(len(boxes)))
            for (x0, y0, size) in boxes:
                # FDDB ellipse: major minor angle cx cy score — a square
                # face box becomes a circle of radius size/2
                r = size / 2.0
                ell_lines.append(
                    f"{r:.6f} {r:.6f} 0.000000 {x0 + r:.6f} {y0 + r:.6f}  1"
                )
        with open(
            os.path.join(root, "FDDB-folds", f"FDDB-fold-{f:02d}.txt"), "w"
        ) as fh:
            fh.write("\n".join(names) + "\n")
        with open(
            os.path.join(
                root, "FDDB-folds", f"FDDB-fold-{f:02d}-ellipseList.txt"
            ),
            "w",
        ) as fh:
            fh.write("\n".join(ell_lines) + "\n")


def score_outputs(root: str, folds: int):
    """discROC points from fold-FF-out.txt vs the ellipse lists: detections
    (score-desc) greedily matched to GT circles at IoU >= 0.5 of the
    bounding boxes."""
    from jda_tpu.fddb import read_ellipses
    from scripts.eval_synth_scenes import iou

    dets = []  # (score, is_tp)
    total_faces = 0

    class _C:
        fddb_dir = root

    for f in range(1, folds + 1):
        gt = read_ellipses(root, f)
        total_faces += sum(len(v) for v in gt.values())
        path = os.path.join(root, "result", f"fold-{f:02d}-out.txt")
        with open(path) as fh:
            toks = fh.read().split("\n")
        i = 0
        while i < len(toks):
            name = toks[i].strip()
            if not name:
                i += 1
                continue
            n = int(toks[i + 1])
            boxes = gt.get(name, np.zeros((0, 6)))
            gt_boxes = [
                (e[3] - e[0], e[4] - e[1], 2 * e[0]) for e in boxes
            ]  # (x0, y0, w): x from the major half-axis, y from the minor
            # (FDDB ellipse rows are (major, minor, angle, cx, cy, 1);
            # equal for the synthetic circles, distinct on real lists)
            rows = [
                [float(v) for v in toks[i + 2 + j].split()] for j in range(n)
            ]
            rows.sort(key=lambda r: -r[4])
            used = set()
            for x, y, w, h, s in rows:
                best, bi = 0.0, -1
                for ind, b in enumerate(gt_boxes):
                    if ind in used:
                        continue
                    v = iou((x, y, w), b)
                    if v > best:
                        best, bi = v, ind
                if best >= 0.5:
                    used.add(bi)
                    dets.append((s, 1))
                else:
                    dets.append((s, 0))
            i += 2 + n
    dets.sort(key=lambda t: -t[0])
    roc = []
    tp = fp = 0
    for s, is_tp in dets:
        tp += is_tp
        fp += 1 - is_tp
        roc.append((fp, tp / max(total_faces, 1), s))
    return total_faces, roc


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="models/flagship_synth.model")
    ap.add_argument("--dir", default="data/fddb_synth")
    ap.add_argument("--folds", type=int, default=2)
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--out-json", default="models/fddb_synth_stats.json")
    args = ap.parse_args()

    import dataclasses

    import jda_tpu
    from jda_tpu.fddb import run_fddb
    from scripts.train_flagship import flagship_config

    if not os.path.exists(
        os.path.join(args.dir, "FDDB-folds", "FDDB-fold-01.txt")
    ):
        build_tree(args.dir, args.folds, args.scenes)

    m = jda_tpu.load_model(args.model)
    c = dataclasses.replace(
        flagship_config(),
        fddb_dir=args.dir,
        fddb_detect_method=1,
        fddb_minimum_size=40,
        fddb_scale_factor=1.25,
        fddb_step=5,
        fddb_nms=True,
        fddb_result=False,
    )
    stats = run_fddb(m, c, folds=list(range(1, args.folds + 1)))
    # fold 1 pays the plan compile; report warm throughput separately
    warm = [f for f in stats["folds"] if f["fold"] > 1]
    if warm:
        stats["warm_images_per_sec"] = round(
            sum(f["images"] for f in warm) / sum(f["seconds"] for f in warm),
            2,
        )

    faces, roc = score_outputs(args.dir, args.folds)
    # headline discROC points: recall at <=1 FP/10-images and at the curve end
    pts = {}
    for fp_budget in (0, args.scenes // 4, args.scenes, 4 * args.scenes):
        best = 0.0
        for fp, rec, s in roc:
            if fp <= fp_budget:
                best = max(best, rec)
        pts[f"recall@fp<={fp_budget}"] = round(best, 4)
    payload = {
        "model": args.model,
        "dir": args.dir,
        "faces": faces,
        "harness": stats,
        "disc_roc_points": pts,
        "roc_tail": roc[-1] if roc else None,
    }
    with open(args.out_json, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"faces": faces, **pts, "img_per_sec": round(stats["images_per_sec"], 2)}))


if __name__ == "__main__":
    main()
