"""Similarity-transform detection parity.

`JoinCascador::Validate` recomputes the similarity transform from the
current shape at every stage (cascador.cpp:180) and applies it to feature
offsets (data.cpp:41-42 via Forward) and to the regression delta
(GenDeltaShape, btcart.cpp:407-424).  This test ports that per-window loop
to straight numpy (float32, same op order as the device kernels) and
checks the batched `cascade_full(with_stp=True)` against it on an
ST-enabled synthetic model.
"""

import numpy as np

import jax.numpy as jnp

from jda_tpu import params as P
from jda_tpu.ops import cascade as C
from jda_tpu.train import features as FT


def st_calc32(shape, ms):
    """f32 STParameter::Calc for one shape (data.cpp:64-114)."""
    x1 = shape[0::2].astype(np.float32)
    y1 = shape[1::2].astype(np.float32)
    x2 = ms[0::2].astype(np.float32)
    y2 = ms[1::2].astype(np.float32)
    tx1 = x1 - x1.mean(dtype=np.float32)
    ty1 = y1 - y1.mean(dtype=np.float32)
    tx2 = x2 - x2.mean(dtype=np.float32)
    ty2 = y2 - y2.mean(dtype=np.float32)
    s1 = np.sqrt((tx1 * tx1 + ty1 * ty1).sum(dtype=np.float32))
    s2 = np.sqrt((tx2 * tx2 + ty2 * ty2).sum(dtype=np.float32))
    scale = s1 / s2
    tx1n, ty1n = tx1 / s1, ty1 / s1
    tx2n, ty2n = tx2 / s2, ty2 / s2
    num = (ty1n * tx2n - tx1n * ty2n).sum(dtype=np.float32)
    den = (tx1n * tx2n + ty1n * ty2n).sum(dtype=np.float32)
    norm = np.sqrt(num * num + den * den)
    sin_t, cos_t = num / norm, den / norm
    return np.array(
        [[scale * cos_t, scale * -sin_t], [scale * sin_t, scale * cos_t]],
        np.float32,
    )


def np_validate_st(m32, row, dims, depth):
    """Per-window C++ Validate with ST, float32 (cascador.cpp:166-211)."""
    offs = np.cumsum([0] + [d * d for d in dims[:-1]])
    ms = m32.mean_shape.astype(np.float32)
    shape = ms.copy()
    score = np.float32(0.0)
    T, K = m32.T, m32.K
    leaf_base = 1 << (depth - 1)
    for t in range(T):
        stp = st_calc32(shape, ms)
        lbf = np.zeros(K, np.int32)
        for k in range(K):
            node = 1
            for _ in range(depth - 1):
                ni = node - 1
                sc = int(m32.scale[t, k, ni])
                pw = np.float32(dims[sc])
                px = shape[2 * m32.lmk1[t, k, ni]]
                py = shape[2 * m32.lmk1[t, k, ni] + 1]
                o1 = m32.off1[t, k, ni].astype(np.float32)
                ox = stp[0, 0] * o1[0] + stp[0, 1] * o1[1]
                oy = stp[1, 0] * o1[0] + stp[1, 1] * o1[1]
                x1 = int(np.clip(np.round((px + ox) * pw), 0, dims[sc] - 1))
                y1 = int(np.clip(np.round((py + oy) * pw), 0, dims[sc] - 1))
                qx = shape[2 * m32.lmk2[t, k, ni]]
                qy = shape[2 * m32.lmk2[t, k, ni] + 1]
                o2 = m32.off2[t, k, ni].astype(np.float32)
                ox2 = stp[0, 0] * o2[0] + stp[0, 1] * o2[1]
                oy2 = stp[1, 0] * o2[0] + stp[1, 1] * o2[1]
                x2 = int(np.clip(np.round((qx + ox2) * pw), 0, dims[sc] - 1))
                y2 = int(np.clip(np.round((qy + oy2) * pw), 0, dims[sc] - 1))
                v = int(row[offs[sc] + y1 * dims[sc] + x1]) - int(
                    row[offs[sc] + y2 * dims[sc] + x2]
                )
                node = 2 * node + (1 if v > m32.feat_th[t, k, ni] else 0)
            leaf = node - leaf_base
            score = (
                score
                + np.float32(m32.leaf_scores[t, k, leaf])
                - np.float32(m32.mean[t, k])
            ) / np.float32(m32.std[t, k])
            if score < np.float32(m32.cart_th[t, k]):
                return False, score, shape
            lbf[k] = k * leaf_base + leaf
        delta = m32.W[t][lbf].sum(axis=0, dtype=np.float32)
        xy = delta.reshape(-1, 2).astype(np.float32)
        rot = (stp @ xy.T).T.reshape(-1)
        shape = (shape + rot).astype(np.float32)
    return True, score, shape


def test_cascade_full_with_stp_matches_numpy_validate():
    dims = (24, 18, 12)
    m = P.synthetic_model(
        T=2, K=8, landmark_n=5, seed=11, multi_scale=True, reject_rate=0.1
    )
    m32 = m.astype(np.float32)
    rng = np.random.default_rng(4)
    N = 64
    D = sum(d * d for d in dims)
    rows = rng.integers(0, 256, (N, D)).astype(np.uint8)

    # batched device path
    geom = FT.corpus_geometry(N, dims)
    state = C.init_state(
        N,
        jnp.asarray(m32.mean_shape, jnp.float32),
        jnp.asarray(geom["base"]),
        jnp.asarray(geom["stride"]),
        jnp.asarray(geom["pw"]),
        jnp.asarray(geom["ph"]),
        jnp.ones(N, bool),
    )
    out = C.cascade_full(
        m.device_arrays(np.float32),
        jnp.asarray(rows.astype(np.int32).reshape(-1)),
        state,
        depth=m.tree_depth,
        rounding=True,
        leaf_n=m.leaf_n,
        T=m.T,
        exact=True,
        with_stp=True,
    )
    alive_d = np.asarray(out["alive"])
    score_d = np.asarray(out["score"])
    shape_d = np.asarray(out["shape"])

    n_alive = 0
    for i in range(N):
        alive, score, shape = np_validate_st(m32, rows[i], dims, m.tree_depth)
        assert alive == bool(alive_d[i]), i
        np.testing.assert_allclose(score, score_d[i], rtol=0, atol=2e-6)
        if alive:
            n_alive += 1
            np.testing.assert_allclose(shape, shape_d[i], rtol=0, atol=2e-5)
    assert n_alive > 0  # the test actually exercises full passes


def test_stp_identity_when_shape_is_mean():
    """st_calc_dev(mean, mean) must be the exact identity — the dense
    stage-0 filter relies on it (shift_size = 0 at detection)."""
    m = P.synthetic_model(T=1, K=4, landmark_n=7, seed=2)
    ms = jnp.asarray(m.mean_shape, jnp.float32)
    stp = np.asarray(C.st_calc_dev(jnp.broadcast_to(ms, (3, len(m.mean_shape))), ms))
    np.testing.assert_array_equal(
        stp, np.broadcast_to(np.eye(2, dtype=np.float32), (3, 2, 2))
    )
