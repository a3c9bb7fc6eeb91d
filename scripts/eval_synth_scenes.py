"""End-to-end quality proxy: detect trained-model faces in composed scenes.

FDDB images are absent from this environment, so this is the closest
available discROC-style evidence (the reference's quality story is the
FDDB discROC, /root/reference/model/discROC-compare.png): faces from the
SAME generator the flagship model was trained on
(scripts/train_flagship.py) are composited at random scales/positions into
textured scenes, detected with the full batched pipeline under C++
rounding semantics (the semantics the model was trained with —
Detector(rounding=True)), and scored by IoU-0.5 recall/precision at a
sweep of score thresholds plus mean inter-pupil-normalized alignment
error of matched detections.

Usage:
  PYTHONPATH=. python scripts/eval_synth_scenes.py \
      models/flagship_synth.model [out.json]

Writes the sweep as JSON (default models/scene_eval.json) and prints a
per-threshold table.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iou(a, b):
    ax0, ay0, aw = a
    bx0, by0, bw = b
    x0 = max(ax0, bx0)
    y0 = max(ay0, by0)
    x1 = min(ax0 + aw, bx0 + bw)
    y1 = min(ay0 + aw, by0 + bw)
    if x1 <= x0 or y1 <= y0:
        return 0.0
    inter = (x1 - x0) * (y1 - y0)
    return inter / (aw * aw + bw * bw - inter)


def build_scenes(rng, n_scenes):
    import cv2

    from scripts.train_flagship import make_face, make_bg

    scenes, gt = [], []
    for _ in range(n_scenes):
        scene = make_bg(rng, 480)[:, :480]
        scene = cv2.resize(scene, (640, 480))
        boxes, lms = [], []
        for _ in range(rng.integers(1, 4)):
            size = int(rng.integers(56, 160))
            face, lm = make_face(rng, size)
            for _try in range(20):
                x0 = int(rng.integers(0, 640 - size))
                y0 = int(rng.integers(0, 480 - size))
                if all(iou((x0, y0, size), b) < 0.1 for b in boxes):
                    break
            scene[y0 : y0 + size, x0 : x0 + size] = face
            boxes.append((x0, y0, size))
            abs_lm = lm.copy()
            abs_lm[0::2] = x0 + abs_lm[0::2] * size
            abs_lm[1::2] = y0 + abs_lm[1::2] * size
            lms.append(abs_lm)
        scenes.append(scene)
        gt.append((boxes, lms))
    return scenes, gt


def score_at(results, gt, th, left_pupils, right_pupils):
    """Greedy IoU-0.5 matching of detections with score >= th."""
    tp = fp = 0
    total = sum(len(b) for b, _ in gt)
    errs = []
    for res, (boxes, lms) in zip(results, gt):
        order = np.argsort(-np.asarray(res.scores))
        used = set()
        for j in order:
            if res.scores[j] < th:
                continue
            bb = tuple(int(v) for v in res.bboxes[j])
            best, bi = 0.0, -1
            for i, b in enumerate(boxes):
                if i in used:
                    continue
                v = iou(bb, b)
                if v > best:
                    best, bi = v, i
            if best >= 0.5:
                tp += 1
                used.add(bi)
                # inter-pupil-normalized alignment error (common.cpp:41-77)
                pred = np.asarray(res.shapes[j], np.float64)
                gtl = lms[bi]
                lp = np.stack(
                    [gtl[0::2][list(left_pupils)], gtl[1::2][list(left_pupils)]]
                ).mean(axis=1)
                rp = np.stack(
                    [gtl[0::2][list(right_pupils)], gtl[1::2][list(right_pupils)]]
                ).mean(axis=1)
                ipd = float(np.hypot(*(lp - rp)))
                d = np.hypot(pred[0::2] - gtl[0::2], pred[1::2] - gtl[1::2])
                errs.append(float(d.mean() / max(ipd, 1e-9)))
            else:
                fp += 1
    return {
        "th": float(th),
        "tp": tp,
        "fp": fp,
        "faces": total,
        "recall": tp / max(total, 1),
        "fp_per_scene": fp / max(len(results), 1),
        "mean_align_error": float(np.mean(errs)) if errs else None,
    }


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    import jda_tpu

    model_path = sys.argv[1] if len(sys.argv) > 1 else "models/flagship_synth.model"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "models/scene_eval.json"
    # ladder density is a detector parameter (the reference's
    # fddb_scale_factor, model/config.json: 1.2); the default 1.25 ladder
    # puts every face's best window within [1/sqrt(1.25), sqrt(1.25)] =
    # [0.894, 1.118] of its true scale, inside the widened training band
    # ([0.87, 1.2], train_flagship.make_face)
    ladder_scale = float(os.environ.get("JDA_TPU_EVAL_SCALE", "1.25"))
    m = jda_tpu.load_model(model_path)
    det = jda_tpu.Detector(m, rounding=True)

    rng = np.random.default_rng(123)
    N_SCENES = 24
    scenes, gt = build_scenes(rng, N_SCENES)

    # one detection pass at the lowest threshold; the sweep filters by
    # score post-NMS (standard discROC generation)
    sweep = [-3.0, -2.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0, 4.0]
    results = det.detect_stream(scenes, batch=8, th=sweep[0], scale=ladder_scale)

    from scripts.train_flagship import flagship_config

    c = flagship_config()
    pts = [
        score_at(results, gt, th, c.left_pupils, c.right_pupils)
        for th in sweep
    ]
    payload = {
        "model": model_path,
        "scenes": N_SCENES,
        "faces": pts[0]["faces"],
        "ladder_scale": ladder_scale,
        "sweep": pts,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    for p in pts:
        err = f"{p['mean_align_error']:.4f}" if p["mean_align_error"] else "-"
        print(
            f"th={p['th']:+.2f}  recall={p['recall']:.3f} "
            f"({p['tp']}/{p['faces']})  fp/scene={p['fp_per_scene']:.2f}  "
            f"align-err={err}"
        )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
