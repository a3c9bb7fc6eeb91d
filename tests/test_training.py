"""Training stack tests: split search vs numpy golden, corpus snapshot
roundtrip, and a tiny end-to-end cascade training run on synthetic faces."""

import numpy as np
import pytest

import jax.numpy as jnp

from jda_tpu.config import Config
from jda_tpu.data import DataSet, patch_row
from jda_tpu.train import split as SP
from jda_tpu.train import features as FT
from jda_tpu.train.boost import Trainer, empty_model
from jda_tpu.utils import calc_mean_error


# ---------------------------------------------------------------------------
# split search vs straightforward numpy implementations of the reference
# ---------------------------------------------------------------------------

def _np_classification_split(vp, wp, vn, wn):
    """Direct port of the scan in cart.cpp:176-252 (float64)."""
    F = vp.shape[1]
    best = (np.inf, 0, -256)
    for f in range(F):
        hp = np.zeros(511)
        hn = np.zeros(511)
        cp = np.zeros(511, int)
        cn = np.zeros(511, int)
        np.add.at(hp, vp[:, f] + 255, wp)
        np.add.at(hn, vn[:, f] + 255, wn)
        np.add.at(cp, vp[:, f] + 255, 1)
        np.add.at(cn, vn[:, f] + 255, 1)
        w = hp.sum() + hn.sum()

        def H(p):
            if abs(p) < 1e-9 or abs(1 - p) < 1e-9:
                return 0.0
            return -(p * np.log(p) + (1 - p) * np.log(1 - p)) / np.log(2)

        entropy = H(hp.sum() / w)
        th_best = -256
        wpl = wnl = 0.0
        cpl = cnl = 0
        for th in range(-255, 256):
            i = th + 255
            wpl += hp[i]
            wnl += hn[i]
            cpl += cp[i]
            cnl += cn[i]
            pr = cpl / len(vp)
            nr = cnl / len(vn)
            if pr < 0.1 or pr > 0.9 or nr < 0.1 or nr > 0.9:
                continue
            wl = wpl + wnl
            wr = w - wl
            e = (wl / w) * H(wpl / wl) + (wr / w) * H((hp.sum() - wpl) / wr)
            if e < entropy:
                entropy = e
                th_best = th
        if entropy < best[0]:
            best = (entropy, f, th_best)
    return best[1], best[2]


def test_classification_split_matches_numpy():
    rng = np.random.default_rng(0)
    Mp, Mn, F = 80, 120, 12
    vp = rng.integers(-40, 41, (Mp, F)).astype(np.int32)
    vn = rng.integers(-40, 41, (Mn, F)).astype(np.int32)
    wp = rng.uniform(0.1, 1.0, Mp)
    wn = rng.uniform(0.1, 1.0, Mn)
    f_ref, th_ref = _np_classification_split(vp, wp, vn, wn)
    f, th, _ = SP.classification_split(
        jnp.asarray(vp),
        jnp.asarray(wp, jnp.float32),
        jnp.ones(Mp, bool),
        jnp.asarray(vn),
        jnp.asarray(wn, jnp.float32),
        jnp.ones(Mn, bool),
    )
    assert (int(f), int(th)) == (f_ref, th_ref)


def test_regression_split_matches_numpy():
    rng = np.random.default_rng(1)
    Mp, F = 100, 10
    vp = rng.integers(-30, 31, (Mp, F)).astype(np.int32)
    resid = rng.normal(0, 0.1, (Mp, 2))
    has_gt = rng.uniform(size=Mp) > 0.1
    u = rng.uniform(0.1, 0.9, F).astype(np.float32)

    # numpy golden (cart.cpp:288-350)
    best = (np.inf, 0, -256)
    for f in range(F):
        th = int(np.sort(vp[:, f])[int(Mp * u[f])])
        lm = (vp[:, f] <= th) & has_gt
        rm = (vp[:, f] > th) & has_gt

        def var(mask, d):
            v = resid[mask, d]
            if len(v) == 0:
                return 0.0
            return v.var()

        metric = (var(lm, 0) + var(lm, 1)) * lm.sum() + (
            var(rm, 0) + var(rm, 1)
        ) * rm.sum()
        if metric < best[0]:
            best = (metric, f, th)

    f, th, _ = SP.regression_split(
        jnp.asarray(vp),
        jnp.asarray(resid, jnp.float32),
        jnp.asarray(has_gt),
        jnp.ones(Mp, bool),
        jnp.asarray(u),
    )
    assert (int(f), int(th)) == (best[1], best[2])


def test_onehot_landmark_select_exact():
    """The MXU one-hot select must be bit-exact vs direct indexing."""
    from jda_tpu.ops.cascade import _onehot_select

    rng = np.random.default_rng(2)
    vec = rng.uniform(0, 1, (257, 27)).astype(np.float32)
    lmk = rng.integers(0, 27, 133).astype(np.int32)
    out = np.asarray(_onehot_select(jnp.asarray(vec), jnp.asarray(lmk)))
    np.testing.assert_array_equal(out, vec[:, lmk])


# ---------------------------------------------------------------------------
# synthetic face corpus
# ---------------------------------------------------------------------------

CANON = np.array(
    [[0.30, 0.35], [0.70, 0.35], [0.50, 0.55], [0.35, 0.75], [0.65, 0.75]]
)


def _tiny_config(**kw) -> Config:
    base = dict(
        T=2,
        K=16,
        landmark_n=5,
        tree_depth=4,
        shift_size=0.05,
        multi_scale=False,
        img_o_size=32,
        img_h_size=24,
        img_q_size=16,
        mining_th=(0.5, 0.5),
        feats=(60, 60),
        radius=(0.3, 0.2),
        probs=(0.8, 0.5),
        recall=(0.99, 0.99),
        drops=(1, 1),
        nps=(1.0, 1.0),
        score_normalization_steps=(2, 2),
        restart_on=False,
        face_augment_on=False,
        left_pupils=(0,),
        right_pupils=(1,),
        snapshot_iter=10_000,
        seed=3,
    )
    base.update(kw)
    return Config(**base)


def make_face(rng, size, jitter=0.02):
    img = rng.integers(110, 150, (size, size)).astype(np.int32)
    lm = CANON + rng.normal(0, jitter, CANON.shape)
    for gx, gy in lm:
        x, y = int(gx * size), int(gy * size)
        img[max(y - 2, 0) : y + 3, max(x - 2, 0) : x + 3] = 20  # dark blob
    # bright forehead band, face-like structure
    img[2 : size // 4, size // 4 : 3 * size // 4] += 60
    return np.clip(img, 0, 255).astype(np.uint8), lm.reshape(-1)


def build_synthetic(c: Config, n_pos=250, n_bg=8, seed=5):
    rng = np.random.default_rng(seed)
    rows, gts = [], []
    for _ in range(n_pos):
        face, lm = make_face(rng, c.img_o_size)
        rows.append(patch_row(face, c))
        gts.append(lm)
    # backgrounds with face-like distractors so hard negatives exist
    bgs = []
    for _ in range(n_bg):
        bg = rng.integers(60, 200, (160, 160)).astype(np.int32)
        for _ in range(40):  # scattered dark blobs + bright bands
            x, y = rng.integers(2, 156, 2)
            bg[y : y + 3, x : x + 3] = 20
        for _ in range(6):
            x, y = rng.integers(0, 120, 2)
            w, h = rng.integers(10, 40, 2)
            bg[y : y + h // 4, x : x + w] += 60
        bgs.append(np.clip(bg, 0, 255).astype(np.uint8))
    return np.stack(rows), np.stack(gts), bgs


# ---------------------------------------------------------------------------
# end-to-end tiny training
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def trained():
    c = _tiny_config()
    tr = Trainer(c)
    tr.mining_max_batches = 40  # synthetic bg pool is small
    rows, gts, bgs = build_synthetic(c)
    tr.set_synthetic_data(rows, gts, bgs)
    init_err = calc_mean_error(
        tr.pos.gt_shapes, tr.pos.current_shapes, c.left_pupils, c.right_pupils
    )
    tr.train()
    return c, tr, init_err


def test_training_separates_scores(trained):
    c, tr, _ = trained
    pl = tr.pos.live_idx()
    assert tr.pos.size > 0.5 * 250
    # RealBoost drives surviving positives to strongly positive scores
    assert tr.pos.scores[pl].mean() > 1.0


def test_training_reduces_alignment_error(trained):
    c, tr, init_err = trained
    pl = tr.pos.live_idx()
    final_err = calc_mean_error(
        tr.pos.gt_shapes[pl],
        tr.pos.current_shapes[pl],
        c.left_pupils,
        c.right_pupils,
    )
    assert final_err < init_err * 0.9, (init_err, final_err)


def test_trained_validator_discriminates(trained):
    c, tr, _ = trained
    rng = np.random.default_rng(99)
    faces = np.stack(
        [patch_row(make_face(rng, c.img_o_size)[0], c) for _ in range(64)]
    )
    noise = np.stack(
        [
            patch_row(
                rng.integers(0, 256, (c.img_o_size, c.img_o_size)).astype(
                    np.uint8
                ),
                c,
            )
            for _ in range(64)
        ]
    )
    validate = tr.make_validator(c.T, -1)
    ok_f, _, _, _ = validate(faces)
    ok_n, _, _, _ = validate(noise)
    assert ok_f.mean() > 0.6, f"face accept rate {ok_f.mean()}"
    assert ok_n.mean() < 0.3, f"noise accept rate {ok_n.mean()}"


def test_trained_model_roundtrip(trained, tmp_path):
    from jda_tpu.params import save_model, load_model

    c, tr, _ = trained
    path = str(tmp_path / "tiny.model")
    tr.model.stage_idx, tr.model.cart_idx = c.T, -1
    save_model(tr.model, path)
    m2 = load_model(path)
    np.testing.assert_allclose(m2.W, tr.model.W)
    np.testing.assert_array_equal(m2.feat_th, tr.model.feat_th)


def test_corpus_snapshot_roundtrip(trained, tmp_path):
    c, tr, _ = trained
    path = str(tmp_path / "corpus.data")
    DataSet.snapshot(tr.pos, tr.neg, path)
    pos2, neg2 = DataSet(c, True), DataSet(c, False)
    DataSet.resume(path, pos2, neg2)
    np.testing.assert_array_equal(pos2.imgs, tr.pos.imgs)
    np.testing.assert_allclose(pos2.current_shapes, tr.pos.current_shapes)
    np.testing.assert_allclose(pos2.scores, tr.pos.scores)
    np.testing.assert_allclose(neg2.weights, tr.neg.weights)
    np.testing.assert_array_equal(pos2.shape_mask, tr.pos.shape_mask)


def test_hard_negative_loading(tmp_path):
    """use_hard: text list loads + writes the binary cache; the cache loads
    back; hard patches are consumed before background scanning."""
    import cv2
    from jda_tpu.data import NegGenerator

    c = _tiny_config(use_hard=True)
    rng = np.random.default_rng(8)
    names = []
    for i in range(5):
        p = str(tmp_path / f"hard_{i}.png")
        cv2.imwrite(p, rng.integers(0, 256, (40, 40)).astype(np.uint8))
        names.append(p)
    (tmp_path / "hard.txt").write_text("\n".join(names) + "\n")
    bg = str(tmp_path / "bg.png")
    cv2.imwrite(bg, rng.integers(0, 256, (120, 120)).astype(np.uint8))
    (tmp_path / "bg.txt").write_text(bg + "\n")

    g = NegGenerator(c, n_states=2)
    g.load([str(tmp_path / "hard.txt"), str(tmp_path / "bg.txt")],
           np.random.default_rng(1))
    assert len(g.hards) == 5
    assert all(h.shape == (c.img_o_size, c.img_o_size) for h in g.hards)
    first = g.next_patch(0)  # hard patches come first
    assert first.shape == (c.img_o_size, c.img_o_size)
    # binary cache round-trips
    g2 = NegGenerator(c, n_states=2)
    g2.load([str(tmp_path / "hard.data"), str(tmp_path / "bg.txt")],
            np.random.default_rng(1))
    assert len(g2.hards) == 5


@pytest.mark.parametrize(
    "kw",
    [
        dict(with_similarity_transform=True),
        dict(multi_scale=True),
    ],
    ids=["similarity-transform", "multi-scale"],
)
def test_training_variant_paths(kw):
    """ST-enabled and multi-scale training paths run and learn."""
    c = _tiny_config(T=1, K=8, feats=(40,), radius=(0.3,), probs=(0.8,),
                     recall=(0.99,), drops=(1,), nps=(1.0,),
                     score_normalization_steps=(2,), mining_th=(0.5,),
                     restart_th=(0.001,), **kw)
    tr = Trainer(c)
    tr.mining_max_batches = 20
    rows, gts, bgs = build_synthetic(c, n_pos=120)
    tr.set_synthetic_data(rows, gts, bgs)
    e0 = calc_mean_error(
        tr.pos.gt_shapes, tr.pos.current_shapes, c.left_pupils, c.right_pupils
    )
    tr.train()
    pl = tr.pos.live_idx()
    e1 = calc_mean_error(
        tr.pos.gt_shapes[pl], tr.pos.current_shapes[pl],
        c.left_pupils, c.right_pupils,
    )
    assert tr.pos.size > 60
    assert e1 < e0, (e0, e1)
    if kw.get("multi_scale"):
        assert (tr.model.scale > 0).any()  # pool sampled h/q features
    if kw.get("with_similarity_transform"):
        # stage-1 transforms are identity (initial shapes are pure
        # translations of the mean); verify the ST math directly instead
        from jda_tpu.data import st_calc, st_apply

        th = 0.3
        rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        base = tr.pos.current_shapes[pl[:4]]
        xy = base.reshape(4, -1, 2) @ rot.T * 1.2
        rotated = xy.reshape(4, -1)
        m_ = st_calc(rotated, base, True)
        # st maps base-frame offsets into the rotated frame: applying it
        # to (base - centroid) should reproduce (rotated - centroid)
        def center(s_):
            c_ = s_.reshape(len(s_), -1, 2).mean(1)
            out = s_.reshape(len(s_), -1, 2) - c_[:, None]
            return out.reshape(len(s_), -1)

        np.testing.assert_allclose(
            st_apply(m_, center(base)), center(rotated), atol=1e-8
        )


def test_restart_path():
    """Cart restart (btcart.cpp:188-232): with an impossible drop-rate
    threshold, carts restart and the best one is kept."""
    c = _tiny_config(T=1, K=14, feats=(30,), radius=(0.3,), probs=(0.9,),
                     recall=(0.99,), drops=(1,), nps=(1.0,),
                     score_normalization_steps=(2,), mining_th=(0.5,),
                     restart_on=True, restart_th=(0.9,), restart_times=2)
    tr = Trainer(c)
    tr.mining_max_batches = 15
    rows, gts, bgs = build_synthetic(c, n_pos=100)
    tr.set_synthetic_data(rows, gts, bgs)
    tr.train()  # completes despite constant restarts (best-cart fallback)
    assert tr.model.stage_idx == 1


def test_hard_factory_topup(monkeypatch):
    """When the background scan under-delivers, more_neg_samples tops up
    from the on-demand hard factory (reference hard-pool channel,
    data.cpp:893-897) — every candidate still gated by the cascade."""
    monkeypatch.setenv("JDA_TPU_DEVICE_MINER", "0")
    c = _tiny_config()
    tr = Trainer(c)
    tr.mining_max_batches = 2  # starve the scan on purpose
    tr.mining_batch = 16  # scan can deliver at most 32 < want
    rows, gts, bgs = build_synthetic(c, n_pos=64, n_bg=1)
    tr.set_synthetic_data(rows, gts, bgs)
    rng = np.random.default_rng(3)
    tr.neg_gen.load_hard_factory(
        lambda i: np.random.default_rng(i)
        .integers(0, 256, (c.img_o_size, c.img_o_size))
        .astype(np.uint8)
    )
    mined = tr.more_neg_samples(0, 0)  # untrained cascade accepts all
    want = int(c.nps[0] * tr.pos.size)
    assert mined == want, (mined, want)
    assert tr.neg.size == want
    cursor0 = tr.neg_gen._hard_cursor
    assert cursor0 > 0  # the factory was actually consulted


def test_hard_factory_adaptive_difficulty():
    """A 2-arg factory opts into generate_hard's difficulty ladder: when
    batch acceptance falls under 10% the difficulty ratchets up, and the
    candidate stream recovers (the round-3 mining-economics fix — without
    it the cascade's FP rate on a fixed distribution decays exponentially
    and mining wall-clock blows up)."""
    from jda_tpu.data import NegGenerator

    c = _tiny_config()
    ng = NegGenerator(c)
    seen = []
    ng.load_hard_factory(
        lambda i, d: (
            seen.append(d),
            np.full((c.img_o_size, c.img_o_size), int(d * 100), np.uint8),
        )[1]
    )
    assert ng._hard_adaptive

    D = sum(d * d for d in (c.img_o_size, c.img_h_size, c.img_q_size))

    def validate(rows):
        # accepts only candidates rendered at difficulty >= 0.3 (pixel
        # value carries the difficulty the factory saw)
        ok = rows[:, 0] >= 30
        n = len(rows)
        return (
            ok,
            np.zeros(n),
            np.zeros((n, c.landmark_dim)),
            np.zeros(n, np.int64),
        )

    rows, scores, shapes, stats = ng.generate_hard(
        validate, 64, batch=32, max_batches=20
    )
    assert len(rows) == 64  # the ladder climbed until supply resumed
    assert stats["difficulty"] >= 0.3
    assert not stats["exhausted"]
    # legacy 1-arg factories keep the fixed behavior
    ng2 = NegGenerator(c)
    ng2.load_hard_factory(
        lambda i: np.zeros((c.img_o_size, c.img_o_size), np.uint8)
    )
    assert not ng2._hard_adaptive


def test_low_yield_mining_passthrough(monkeypatch):
    """Trainer.dry_yield_frac: mining events that net only a trickle
    (deep stages of a near-converged detector, FP ~1e-5) count as dry;
    two consecutive dry events pass-through-finalize the stage exactly
    like full exhaustion (the reference would spin forever,
    data.cpp:913-925).  The stage still gets its global regression W."""
    c = _tiny_config(T=1, K=16, feats=(30,), radius=(0.3,), probs=(0.9,),
                     recall=(0.99,), drops=(1,), nps=(1.0,),
                     score_normalization_steps=(2,), mining_th=(0.5,))
    tr = Trainer(c)
    tr.dry_yield_frac = 0.05
    rows, gts, bgs = build_synthetic(c, n_pos=64, n_bg=1)
    tr.set_synthetic_data(rows, gts, bgs)

    calls = []
    orig = tr.more_neg_samples

    def trickle(t, k):
        if not calls:
            calls.append(1)
            return orig(t, k)  # first fill: untrained cascade accepts all
        # afterwards: bounded miners net ~1% of the quota per event
        calls.append(1)
        tr._last_want = 100
        n = 1
        trow = np.random.default_rng(len(calls)).integers(
            0, 256, (n, rows.shape[1])
        ).astype(np.uint8)
        tr.neg.append_negatives(
            trow,
            np.zeros(n),
            np.tile(tr.model.mean_shape, (n, 1)),
            tr.model.mean_shape,
        )
        return n

    tr.more_neg_samples = trickle
    tr.train()
    assert tr.model.stage_idx == 1  # stage finalized, not spinning
    assert len(calls) >= 3
    # trailing carts are exact pass-throughs
    assert np.isneginf(tr.model.cart_th[0]).any()
    k_pass = np.isneginf(tr.model.cart_th[0])
    assert (tr.model.leaf_scores[0, k_pass] == 0).all()
    assert (tr.model.std[0, k_pass] == 1).all()
    # global regression still ran
    assert np.abs(tr.model.W[0]).sum() > 0


def test_restart_snapshot_does_not_leak_across_carts():
    """A cart whose restarts all score 0.0% neg drop must NOT inherit an
    earlier cart's best-restart snapshot (foreign splits/leaves/th).  The
    reference leaks its best_cart this way (btcart.cpp:138,201-208 — the
    disabled assert at btcart.cpp:225 documents the th desync); with a
    stale th from a different score distribution, remove() can mass-drop
    positives (observed: 70% of the corpus in one cart)."""
    c = _tiny_config(T=1, K=14, feats=(30,), radius=(0.3,), probs=(0.9,),
                     recall=(0.99,), drops=(1,), nps=(1.0,),
                     score_normalization_steps=(2,), mining_th=(0.5,),
                     restart_on=True, restart_th=(0.9,), restart_times=2)
    tr = Trainer(c)
    tr.mining_max_batches = 15
    rows, gts, bgs = build_synthetic(c, n_pos=100)
    tr.set_synthetic_data(rows, gts, bgs)

    # unlimited negative supply (noise patches appended unvalidated): the
    # point of this test is the restart bookkeeping, not mining — the real
    # miner drains the tiny synthetic pool before the restart-eligible
    # carts (t*K + k > 10) are ever reached
    mine_rng = np.random.default_rng(11)

    def fake_mining(t, k):
        want = int(c.nps[t] * tr.pos.size) - tr.neg.size
        if want <= 0:
            return -1
        fresh = mine_rng.integers(0, 256, (want, rows.shape[1])).astype(
            np.uint8
        )
        tr.neg.append_negatives(
            fresh,
            np.zeros(want),
            np.tile(tr.model.mean_shape, (want, 1)),
            tr.model.mean_shape,
        )
        return want

    tr.more_neg_samples = fake_mining

    # script pre_remove: restart checks run only for carts with
    # t*K + k > 10, i.e. k in {11, 12, 13}.  Cart 11's two restart rounds
    # see a positive drop (a snapshot IS taken); carts 12/13's rounds see
    # zero (no snapshot of their own) — under the leak, cart 12 would be
    # restored from cart 11's snapshot.
    neg = tr.neg
    orig_pre_remove = type(neg).pre_remove
    calls = {"k11": 0}

    def scripted(self, th):
        n = orig_pre_remove(self, th)
        k = tr.model.cart_idx
        if k < 11:
            return n
        if k == 11:
            calls["k11"] += 1
            return 1  # tmp_drop > 0: snapshot taken, then exhaust keeps it
        return 0  # carts 12/13: all rounds 0.0% — exhaust with None

    import types
    neg.pre_remove = types.MethodType(scripted, neg)
    restored_at = []
    orig_restore = tr._restore_cart

    def spy(t, k, snap):
        restored_at.append(k)
        return orig_restore(t, k, snap)

    tr._restore_cart = spy
    tr.train()
    assert tr.model.stage_idx == 1
    assert calls["k11"] >= 2
    # cart 11 may restore its own snapshot; carts 12/13 must not restore
    # anything (their best snapshot is None once the leak is fixed)
    assert 12 not in restored_at and 13 not in restored_at, restored_at
    # and consecutive carts never end up as clones of each other
    ls = tr.model.leaf_scores[0]
    for k in (12, 13):
        assert not np.array_equal(ls[k], ls[k - 1]), k
