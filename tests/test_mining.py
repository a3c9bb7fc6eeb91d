"""Device-miner parity: window enumeration, on-device crop+resize
synthesis, and end-to-end mining vs the host path.

The device miner (jda_tpu/train/mining.py) replaces the reference's
per-window host mining loop (src/jda/data.cpp:885-1012) with resident
backgrounds + MXU-synthesized windows; these tests pin the parts that
must match the host semantics exactly.
"""

import sys

import numpy as np
import pytest

from jda_tpu.data import NegGenerator
from jda_tpu.train.boost import Trainer
from jda_tpu.train.mining import DeviceMiner, _bilinear_taps, _make_synth

sys.path.insert(0, "tests")
from test_training import _tiny_config, build_synthetic  # noqa: E402


def _bgs(c, n=20, size=160, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        bg = rng.integers(50, 210, (size, size)).astype(np.int32)
        for _ in range(40):
            x, y = rng.integers(2, size - 4, 2)
            bg[y : y + 3, x : x + 3] = 25
        out.append(np.clip(bg, 0, 255).astype(np.uint8))
    return out


def test_collect_matches_next_patch_stream():
    """Per-state window sequences from the batch collector must equal the
    one-at-a-time next_patch stream (data.cpp:885-966 enumeration)."""
    c = _tiny_config()
    bgs = _bgs(c)
    gA = NegGenerator(c)
    gA.load_images(bgs, np.random.default_rng(5))
    gB = NegGenerator(c)
    gB.load_images(bgs, np.random.default_rng(5))
    perA = {s: [] for s in range(gA.n_states)}
    for b in range(2048):
        sid = b % gA.n_states
        perA[sid].append(gA.next_patch(sid))
    m = DeviceMiner(gB, c, per_state=64)
    perB = {s: [] for s in range(gB.n_states)}
    for _ in range(6):
        for gr in m._collect():
            for p in range(gr["n"]):
                y, x, w = int(gr["ys"][p]), int(gr["xs"][p]), gr["w"]
                perB[gr["sid"]].append(gr["bg"][y : y + w, x : x + w])
    for s in range(gA.n_states):
        n = min(len(perA[s]), len(perB[s]))
        assert n > 30
        for i in range(n):
            assert perA[s][i].shape == perB[s][i].shape
            np.testing.assert_array_equal(perA[s][i], perB[s][i])


@pytest.mark.parametrize("multi", [False, True])
def test_synth_matches_cv2_resize(multi):
    """On-device one-hot-matmul crop+bilinear must match cv2.resize
    INTER_LINEAR (data.cpp:957-960 pixel semantics) to <=1 LSB — for the
    o patch alone (single-scale) and for the full o/h/q triple
    (multi-scale models read HALF/QUARTER patches, common.hpp:68-104)."""
    import cv2
    import jax.numpy as jnp

    c = _tiny_config(multi_scale=multi)
    g = NegGenerator(c)
    g.load_images(_bgs(c), np.random.default_rng(5))
    m = DeviceMiner(g, c, per_state=96)
    groups = m._collect()
    m._ensure_bgs(groups)
    H, W = m._hw
    S, P = g.n_states, m.P
    sizes = (
        (c.img_o_size, c.img_h_size, c.img_q_size)
        if multi
        else (c.img_o_size,)
    )
    ssum = sum(sizes)
    D = sum(d * d for d in (c.img_o_size, c.img_h_size, c.img_q_size))
    synth = _make_synth(S, P, H, W, sizes, D)
    b = S * P
    ipack = np.zeros((S, 3 * P + 2 * ssum), np.int32)
    fpack = np.zeros(2 * S * ssum + 2 * b, np.float32)
    for gr in groups:
        sid = gr["sid"]
        ipack[sid, :P] = gr["ys"]
        ipack[sid, P : 2 * P] = gr["xs"]
        col, fb = 2 * P, 0
        for sz in sizes:
            a, b_, c0, c1 = _bilinear_taps(gr["w"], sz)
            ipack[sid, col : col + sz] = a
            ipack[sid, col + sz : col + 2 * sz] = b_
            col += 2 * sz
            fpack[fb + sid * sz : fb + (sid + 1) * sz] = c0
            fpack[fb + S * sz + sid * sz : fb + S * sz + (sid + 1) * sz] = c1
            fb += 2 * S * sz
        ipack[sid, col : col + gr["n"]] = 1
    ms = np.zeros(c.landmark_dim, np.float32)
    flat, _, _ = synth(
        m._bgs_dev, jnp.asarray(ipack), jnp.asarray(fpack), jnp.asarray(ms)
    )
    flat = np.asarray(flat).reshape(S * P, D)
    nbad = ntot = 0
    for gr in groups:
        sid = gr["sid"]
        for p in range(gr["n"]):
            y, x, w = int(gr["ys"][p]), int(gr["xs"][p]), gr["w"]
            off = 0
            for sz in sizes:
                ref = cv2.resize(
                    gr["bg"][y : y + w, x : x + w], (sz, sz)
                ).astype(np.int32)
                got = flat[sid * P + p, off : off + sz * sz].reshape(sz, sz)
                off += sz * sz
                d = np.abs(ref - got)
                assert d.max() <= 1
                nbad += int((d > 0).sum())
                ntot += d.size
    # off-by-one pixels must stay rare.  Exactness vs cv2 is impossible
    # for the h/q downscales: cv2 descales a 22-bit fixed-point sum in one
    # rounding, while the separable two-matmul's second pass multiplies a
    # 19-bit-exact intermediate by an 11-bit coefficient (30 significant
    # bits > f32's 24), so half-way points flip an LSB — measured ~4% on
    # the thirds-weight 32->24/16 chains vs <0.1% for the o patch.  The
    # exact host revalidation in generate() makes stored rows exact
    # regardless; the synth is only a screen.
    assert nbad / ntot < (0.06 if multi else 0.001)


def test_device_mining_end_to_end():
    """Train a tiny cascade (device-miner path active), then compare
    device vs host mining on the trained validator: both must report
    consistent screen statistics, and every device-mined row must pass
    the exact host validator (they are revalidated by construction)."""
    c = _tiny_config()
    tr = Trainer(c)
    tr.mining_max_batches = 25
    rows, gts, bgs = build_synthetic(c)
    tr.set_synthetic_data(rows, gts, bgs)
    tr.train_stage(0)

    v = tr.make_validator(0, c.K - 1)
    g1 = NegGenerator(c)
    g1.load_images(bgs, np.random.default_rng(11))
    g2 = NegGenerator(c)
    g2.load_images(bgs, np.random.default_rng(11))
    m = DeviceMiner(g1, c, per_state=128)
    r_dev, s_dev, sh_dev, st_dev = m.generate(
        v, 64, max_batches=20, rng=np.random.default_rng(4)
    )
    r_host, s_host, sh_host, st_host = g2.generate(
        v, 64, batch=1024, max_batches=20
    )
    # mined rows revalidate as accepted (fresh random shifts, so a
    # borderline row may flip; the bulk must hold — only meaningful with
    # enough samples)
    if len(r_dev) >= 5:
        ok, score, shape, _ = v(r_dev)
        assert ok.mean() >= 0.6
    assert st_dev["not_hard"] > 0
    # comparable rejection depth across paths
    assert (
        abs(st_dev["avg_reject_carts"] - st_host["avg_reject_carts"])
        < 1.0 + 0.5 * st_host["avg_reject_carts"]
    )


# ---------------------------------------------------------------------------
# canvas-based near-miss mining (CanvasHardMiner)
# ---------------------------------------------------------------------------

def _canvas_factory(c):
    """Deterministic test canvases: a bright 'face' square inside clutter;
    odd indices are off-manifold (any_window) canvases."""

    def factory(i, d=0.0):
        rng = np.random.default_rng(1000 + i)
        R = int(rng.integers(c.img_o_size, 2 * c.img_o_size))
        C = 3 * R
        canvas = rng.integers(40, 200, (C, C)).astype(np.uint8)
        canvas[R : 2 * R, R : 2 * R] = rng.integers(150, 255, (R, R))
        return canvas, (R, R, R), bool(i % 2)

    return factory


def test_canvas_window_geometry():
    """Boundary slots must only emit windows with IoU in [lo, 0.48]
    against the face box; registered slots stay in the positives' band."""
    from jda_tpu.train.mining import CanvasHardMiner, _box_iou_vec

    c = _tiny_config()
    g = NegGenerator(c)
    g.load_canvas_factory(_canvas_factory(c))
    m = CanvasHardMiner(g, c, n_slots=4, per_slot=64)
    m._refresh(4)
    rng = np.random.default_rng(0)
    for slot in m.slots:
        w, ys, xs, n = m._sample_windows(slot, rng)
        assert n > 0
        C = slot["canvas"].shape[0]
        assert (xs[:n] >= 0).all() and (xs[:n] + w <= C).all()
        assert (ys[:n] >= 0).all() and (ys[:n] + w <= C).all()
        iou = _box_iou_vec(
            xs[:n].astype(np.float64),
            ys[:n].astype(np.float64),
            w,
            slot["fx"],
            slot["fy"],
            slot["fs"],
        )
        if slot["any"]:
            assert (iou > 0.3).all()  # registered windows overlap the face
        else:
            assert (iou >= 0.22 - 1e-9).all() and (iou <= 0.48 + 1e-9).all()


def test_canvas_miner_generate_bitexact():
    """End-to-end canvas mining with an untrained cascade (accepts all):
    fills the quota, and every stored corpus row equals the host
    truncation-subsample rebuild (patch_row o/h/q planes)."""
    from jda_tpu.data import patch_row
    from jda_tpu.train.mining import CanvasHardMiner, _subsample

    c = _tiny_config()
    tr = Trainer(c)
    rows, gts, bgs = build_synthetic(c, n_pos=64, n_bg=1)
    tr.set_synthetic_data(rows, gts, bgs)
    tr.neg_gen.load_canvas_factory(_canvas_factory(c))
    validator = tr.make_validator(0, -1)  # untrained: accepts everything
    m = CanvasHardMiner(tr.neg_gen, c, n_slots=4, per_slot=32)
    out_rows, scores, shapes, stats = m.generate(
        validator, 64, max_batches=4, rng=np.random.default_rng(7)
    )
    assert len(out_rows) == 64
    assert not stats["exhausted"]
    assert stats["fp_rate"] > 0.9  # untrained cascade accepts ~all
    assert out_rows.shape[1] == sum(
        d * d for d in (c.img_o_size, c.img_h_size, c.img_q_size)
    )
    # shapes carry the mean shape + shift -> finite, near [0, 1]
    assert np.isfinite(shapes).all()
    assert (shapes > -0.5).all() and (shapes < 1.5).all()


def test_canvas_synth_device_matches_host_subsample():
    """The device one-tap synth (truncation coordinate map) must be
    BIT-exact vs the host _subsample rebuild on the o plane — the
    property that makes screen verdicts and revalidation agree."""
    import jax.numpy as jnp

    from jda_tpu.data import patch_row
    from jda_tpu.train.mining import (
        CanvasHardMiner,
        _make_synth,
        _subsample,
        _trunc_taps,
    )

    c = _tiny_config()
    g = NegGenerator(c)
    g.load_canvas_factory(_canvas_factory(c))
    m = CanvasHardMiner(g, c, n_slots=2, per_slot=16)
    m._refresh(2)
    m._ensure_dev()
    H, W = m._hw
    S, P = m.S, m.P
    o = c.img_o_size
    sizes = (o,)
    D = sum(d * d for d in (c.img_o_size, c.img_h_size, c.img_q_size))
    synth = _make_synth(S, P, H, W, sizes, D)
    rng = np.random.default_rng(3)
    ipack = np.zeros((S, 3 * P + 2 * o), np.int32)
    fpack = np.zeros(2 * S * o + 2 * S * P, np.float32)
    meta = []
    for sid, slot in enumerate(m.slots):
        w, ys, xs, n = m._sample_windows(slot, rng)
        meta.append((slot["canvas"], w, ys, xs, n))
        a, bt, c0, c1 = _trunc_taps(w, o)
        ipack[sid, :P] = ys
        ipack[sid, P : 2 * P] = xs
        ipack[sid, 2 * P : 2 * P + o] = a
        ipack[sid, 2 * P + o : 2 * P + 2 * o] = bt
        ipack[sid, 2 * P + 2 * o : 2 * P + 2 * o + n] = 1
        fpack[sid * o : (sid + 1) * o] = c0
        fpack[S * o + sid * o : S * o + (sid + 1) * o] = c1
    ms = np.zeros(c.landmark_dim, np.float32)
    flat, shapes, valid = synth(
        m._canv_dev, jnp.asarray(ipack), jnp.asarray(fpack), jnp.asarray(ms)
    )
    flat = np.asarray(flat).reshape(S * P, D)
    for sid, (cv, w, ys, xs, n) in enumerate(meta):
        for p in range(n):
            host = _subsample(cv, int(xs[p]), int(ys[p]), w, o)
            dev = flat[sid * P + p, : o * o].reshape(o, o)
            np.testing.assert_array_equal(dev, host.astype(np.int32))


def test_canvas_miner_in_more_neg_samples(monkeypatch):
    """Trainer.more_neg_samples prefers the canvas miner for the
    shortfall once the background scan under-delivers."""
    monkeypatch.setenv("JDA_TPU_DEVICE_MINER", "0")
    c = _tiny_config()
    tr = Trainer(c)
    tr.mining_max_batches = 2
    tr.mining_batch = 16  # host scan supplies at most 32 windows
    rows, gts, bgs = build_synthetic(c, n_pos=64, n_bg=1)
    tr.set_synthetic_data(rows, gts, bgs)
    tr.neg_gen.load_canvas_factory(_canvas_factory(c))
    mined = tr.more_neg_samples(0, 0)
    want = int(c.nps[0] * tr.pos.size)
    assert mined == want
    assert tr.neg.size == want
    assert tr._canvas_miner is not None
    assert tr.neg_gen._canvas_cursor > 0
