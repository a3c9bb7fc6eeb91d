"""CLI end-to-end smoke: train from face.txt/background files via
`python -m jda_tpu train`, then detect with the result — the file-based
data path (LoadPositiveDataSet / NegGenerator::Load equivalents)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from test_training import make_face  # noqa: E402


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("cliws")
    rng = np.random.default_rng(77)
    # positive images: full frames with a face crop region
    face_lines = []
    for i in range(60):
        face, lm = make_face(rng, 64)
        frame = rng.integers(0, 256, (96, 96)).astype(np.uint8)
        frame[16:80, 16:80] = face
        p = str(d / f"face_{i}.jpg")
        cv2.imwrite(p, frame, [cv2.IMWRITE_JPEG_QUALITY, 100])
        lm_abs = lm.copy()
        lm_abs[0::2] = lm_abs[0::2] * 64 + 16
        lm_abs[1::2] = lm_abs[1::2] * 64 + 16
        face_lines.append(
            p + " 16 16 64 64 " + " ".join(f"{v:.3f}" for v in lm_abs)
        )
    (d / "face.txt").write_text("\n".join(face_lines) + "\n")

    bg_lines = []
    for i in range(6):
        bg = rng.integers(0, 256, (128, 128)).astype(np.uint8)
        p = str(d / f"bg_{i}.png")
        cv2.imwrite(p, bg)
        bg_lines.append(p)
    (d / "bg.txt").write_text("\n".join(bg_lines) + "\n")
    (d / "hard.txt").write_text("")  # unused (use_hard false)

    test_img = rng.integers(0, 256, (100, 120)).astype(np.uint8)
    cv2.imwrite(str(d / "scene.png"), test_img)
    (d / "test.txt").write_text(str(d / "scene.png") + "\n")

    cfg = {
        "T": 1,
        "K": 6,
        "landmark_n": 5,
        "tree_depth": 4,
        "random_shift": 0.03,
        "image_size": {
            "multi_scale": False,
            "origin_size": 24,
            "half_size": 18,
            "quarter_size": 12,
        },
        "hard_negative_mining": {
            "mining_th": [0.5],
            "min_size": 32,
            "factor": 1.3,
            "step_ratio": 0.5,
        },
        "stages": {
            "feature_pool_size": [30],
            "random_sample_radius": [0.3],
            "classification_p": [0.8],
            "recall": [0.99],
            "drop_n": [1],
            "neg_pos_ratio": [1.0],
            "score_normalization_step": [2],
        },
        "data": {
            "use_hard": False,
            "face": str(d / "face.txt"),
            "background": [str(d / "hard.txt"), str(d / "bg.txt")],
            "test": str(d / "test.txt"),
        },
        "fddb": {
            "dir": str(d),
            "out": False,
            "nms": True,
            "draw_score": False,
            "draw_shape": False,
            "minimum_size": 24,
            "step": 6,
            "scale": 1.4,
            "overlap": 0.3,
            "method": 1,
        },
        "cart": {"restart": {"on": False, "th": [0.001], "times": 5}},
        "face": {
            "online_augment": True,
            "symmetric_landmarks": {
                "offset": 0,
                "left": [0, 3],
                "right": [1, 4],
            },
            "pupils": {"offset": 0, "left": [0], "right": [1]},
            "similarity_transform": False,
        },
        "resume": {"model": "", "data": ""},
        "snapshot_iter": 1000,
    }
    (d / "config.json").write_text(json.dumps(cfg))
    return d


def test_cli_train_and_test(workspace, monkeypatch):
    from jda_tpu import cli

    d = workspace
    rc = cli.main(
        [
            "--config",
            str(d / "config.json"),
            "train",
            "--model",
            str(d / "out.model"),
            "--data-cache",
            str(d / "cache.data"),
            "--snapshot-dir",
            str(d / "snaps"),
        ]
    )
    assert rc == 0
    assert os.path.exists(d / "out.model")
    assert os.path.exists(d / "cache.data")

    from jda_tpu.params import load_model

    m = load_model(str(d / "out.model"))
    assert (m.T, m.K, m.landmark_n) == (1, 6, 5)
    # flip augment doubled the corpus; model trained a real stage
    assert np.abs(m.W[0]).sum() > 0

    rc = cli.main(
        [
            "--config",
            str(d / "config.json"),
            "test",
            "--model",
            str(d / "out.model"),
            "--out",
            str(d / "test_result"),
        ]
    )
    assert rc == 0
    assert os.path.exists(d / "test_result" / "000000.jpg")


def test_cli_live_on_video(workspace):
    """`jda live --video` over a synthesized AVI (src/live.cpp:11-52):
    the stream loop must decode frames, detect on each, and exit cleanly
    at end-of-stream (no camera in CI; DISPLAY-less so nothing is shown)."""
    import cv2

    from jda_tpu import cli
    from jda_tpu import params as P

    d = workspace
    m = P.synthetic_model(T=1, K=6, landmark_n=5, seed=3, reject_rate=0.3)
    mp = str(d / "live.model")
    P.save_model(m, mp, dtype="double")

    vid = str(d / "clip.avi")
    wr = cv2.VideoWriter(
        vid, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (120, 96)
    )
    assert wr.isOpened()
    rng = np.random.default_rng(5)
    for _ in range(4):
        frame = rng.integers(0, 256, (96, 120, 3)).astype(np.uint8)
        wr.write(frame)
    wr.release()

    rc = cli.main(
        [
            "--config",
            str(d / "config.json"),
            "live",
            "--model",
            mp,
            "--video",
            vid,
            "--no-show",
        ]
    )
    assert rc == 0
