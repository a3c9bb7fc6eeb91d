"""Held-out quality evaluation: the flagship model vs scenes it was NOT
trained on.

Every committed quality number so far (scene recall, FDDB-synth) measures
faces from the same `make_face` generator the model was trained on — in-
distribution evidence.  The reference's quality artifact is a discROC on
*independent* data (/root/reference/model/discROC-compare.png); FDDB
images are absent from this environment, so this harness stands in by
perturbing the evaluation distribution along axes the training generator
NEVER produced:

  photometric  gamma 0.6-1.6 + contrast 0.7-1.3 + brightness shift on the
               composited scene (training renders fixed-range u8 directly)
  blur         extra Gaussian sigma 1.0-1.8 post-composite (training blur
               is the band-limit tied to face scale only)
  occlusion    a random clutter patch covering ~15-25% of each face
  gradient     a smooth 0.55-1.35x illumination ramp across the scene
  texture_bg   faces composited over correlated-noise backgrounds (never
               mined against: make_bg tiles are white-noise + distractors)

plus the unperturbed `base` family as the in-distribution anchor.  Each
family gets its own threshold sweep (recall / fp-per-scene / alignment
error), written to models/scene_eval_holdout.json.

Usage:
  PYTHONPATH=. python scripts/eval_holdout.py \
      [models/flagship_synth.model] [models/scene_eval_holdout.json]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.eval_synth_scenes import build_scenes, score_at, iou  # noqa: E402


def _smooth_noise(rng, h, w, cells=12):
    """Correlated (low-frequency) texture: upsampled coarse noise — a
    background statistic the mining corpus never contained."""
    import cv2

    coarse = rng.integers(40, 215, (cells, cells)).astype(np.uint8)
    return cv2.resize(coarse, (w, h), interpolation=cv2.INTER_CUBIC)


def perturb(rng, scene, gt_boxes, family):
    """Return a perturbed copy of `scene` for the given family."""
    import cv2

    img = scene.astype(np.float32)
    if family == "photometric":
        gamma = rng.choice([rng.uniform(0.6, 0.8), rng.uniform(1.3, 1.6)])
        img = 255.0 * (img / 255.0) ** gamma
        img = (img - 127.5) * rng.uniform(0.7, 1.3) + 127.5
        img += rng.uniform(-30, 30)
    elif family == "blur":
        sigma = rng.uniform(1.0, 1.8)
        img = cv2.GaussianBlur(img, (0, 0), sigmaX=sigma, sigmaY=sigma)
    elif family == "occlusion":
        for (x0, y0, s) in gt_boxes:
            side = int(s * rng.uniform(0.38, 0.5))  # area 15-25%
            ox = int(rng.integers(x0, max(x0 + s - side, x0 + 1)))
            oy = int(rng.integers(y0, max(y0 + s - side, y0 + 1)))
            img[oy : oy + side, ox : ox + side] = rng.integers(
                30, 220, (min(side, img.shape[0] - oy), min(side, img.shape[1] - ox))
            )
    elif family == "gradient":
        h, w = img.shape
        gx = np.linspace(0, 1, w)[None, :]
        gy = np.linspace(0, 1, h)[:, None]
        a, b = rng.uniform(-0.4, 0.4, 2)
        ramp = 0.95 + a * (gx - 0.5) + b * (gy - 0.5)
        img *= np.clip(ramp, 0.55, 1.35)
    return np.clip(img, 0, 255).astype(np.uint8)


def build_texture_scenes(rng, n_scenes):
    """Faces (training generator) composited on correlated-noise
    backgrounds the cascade never mined against."""
    from scripts.train_flagship import make_face

    scenes, gt = [], []
    for _ in range(n_scenes):
        scene = _smooth_noise(rng, 480, 640)
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
    from scripts.train_flagship import flagship_config

    model_path = (
        sys.argv[1] if len(sys.argv) > 1 else "models/flagship_synth.model"
    )
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "models/scene_eval_holdout.json"
    )
    ladder_scale = float(os.environ.get("JDA_TPU_EVAL_SCALE", "1.25"))
    n_scenes = int(os.environ.get("JDA_TPU_EVAL_SCENES", "24"))

    m = jda_tpu.load_model(model_path)
    det = jda_tpu.Detector(m, rounding=True)
    c = flagship_config()
    sweep = [-3.0, -2.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0, 4.0]

    rng = np.random.default_rng(777)  # disjoint from train (0..) / eval (123)
    base_scenes, base_gt = build_scenes(rng, n_scenes)

    families = {}
    families["base"] = (base_scenes, base_gt)
    for fam in ("photometric", "blur", "occlusion", "gradient"):
        fam_rng = np.random.default_rng(hash(fam) % (2**32))
        families[fam] = (
            [
                perturb(fam_rng, s, gtb, fam)
                for s, (gtb, _) in zip(base_scenes, base_gt)
            ],
            base_gt,
        )
    families["texture_bg"] = build_texture_scenes(
        np.random.default_rng(778), n_scenes
    )

    payload = {
        "model": model_path,
        "scenes_per_family": n_scenes,
        "ladder_scale": ladder_scale,
        "families": {},
    }
    for fam, (scenes, gt) in families.items():
        results = det.detect_stream(
            scenes, batch=8, th=sweep[0], scale=ladder_scale
        )
        pts = [
            score_at(results, gt, th, c.left_pupils, c.right_pupils)
            for th in sweep
        ]
        payload["families"][fam] = pts
        # headline: best recall at fp/scene == 0, and recall at th=-0.5
        fp0 = [p for p in pts if p["fp_per_scene"] == 0.0]
        r0 = max((p["recall"] for p in fp0), default=0.0)
        rm = next((p for p in pts if p["th"] == -0.5), pts[0])
        print(
            f"{fam:12s} recall@fp0={r0:.3f}  "
            f"recall@-0.5={rm['recall']:.3f} "
            f"fp/scene@-0.5={rm['fp_per_scene']:.2f}"
        )
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
