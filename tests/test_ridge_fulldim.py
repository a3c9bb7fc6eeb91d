"""Full-LBF-dimension ridge validation (VERDICT r1 weak #5).

The global regression solves (X^T X + lam I) W = X^T y with X the K-hot
LBF design matrix at full flagship dimension K*leaf_n = 4320
(btcart.cpp:328-388; lam = n/2 from liblinear's C = 1/n).  Round-1 only
exercised K*8 <= 128; this builds the full 4320x4320 system in float32 on
device and checks it against a float64 numpy solve.
"""

import numpy as np

from jda_tpu.train.regression import ridge_lbf


def _synthetic_lbf(n, K, leaf_n, L2, seed):
    rng = np.random.default_rng(seed)
    lbf = (
        rng.integers(0, leaf_n, (n, K)).astype(np.int32)
        + np.arange(K, dtype=np.int32)[None, :] * leaf_n
    )
    F = K * leaf_n
    W_true = rng.normal(0, 0.02, (F, L2))
    resid = W_true[lbf].sum(axis=1) + rng.normal(0, 1e-3, (n, L2))
    return lbf, resid.astype(np.float32), W_true, F


def test_ridge_full_lbf_dim_matches_f64():
    K, leaf_n, L2 = 540, 8, 54  # flagship: 4320 x 4320 normal equations
    n = 4096
    lbf, resid, _, F = _synthetic_lbf(n, K, leaf_n, L2, seed=0)

    W32 = ridge_lbf(lbf, resid, F)  # device f32 build + Cholesky

    # float64 reference solve of the same normal equations
    E = np.zeros((n, F))
    E[np.arange(n)[:, None], lbf] = 1.0
    lam = n / 2.0
    A = E.T @ E + lam * np.eye(F)
    b = E.T @ resid.astype(np.float64)
    W64 = np.linalg.solve(A, b)

    assert np.isfinite(W32).all()
    # f32 normal equations at 4320 dims: lam = n/2 dominates the spectrum,
    # so conditioning is mild; agreement should be ~f32 resolution
    denom = max(np.abs(W64).max(), 1e-12)
    rel = np.abs(W32 - W64).max() / denom
    assert rel < 5e-3, rel

    # the solve actually predicts: delta = sum of selected rows
    pred32 = W32[lbf].sum(axis=1)
    pred64 = W64[lbf].sum(axis=1)
    # f32 prediction sums over K rows of a 4320-dim solve: observed error
    # is ~2e-4 and shifts with XLA:CPU codegen (the persistent cache may
    # hold kernels compiled for a different host's vector features), so
    # give f32 a realistic budget rather than pinning one codegen's rounding
    np.testing.assert_allclose(pred32, pred64, atol=1e-3)


def test_ridge_full_dim_reduces_shape_error():
    K, leaf_n, L2 = 540, 8, 54
    n = 4096
    lbf, resid, _, F = _synthetic_lbf(n, K, leaf_n, L2, seed=1)
    W = ridge_lbf(lbf, resid, F)
    pred = W[lbf].sum(axis=1)
    before = float((resid**2).mean())
    after = float(((resid - pred) ** 2).mean())
    assert after < 0.5 * before, (before, after)
