"""Model format tests: roundtrips + bit-compatibility with the reference
parsers (the compiled reference C library reads our files and vice versa)."""

import os

import numpy as np
import pytest

from jda_tpu import params as P
from jda_tpu import oracle


def _assert_params_equal(a, b, atol=0.0):
    assert (a.T, a.K, a.landmark_n, a.tree_depth) == (
        b.T,
        b.K,
        b.landmark_n,
        b.tree_depth,
    )
    np.testing.assert_allclose(a.mean_shape, b.mean_shape, atol=atol)
    np.testing.assert_array_equal(a.scale, b.scale)
    np.testing.assert_array_equal(a.lmk1, b.lmk1)
    np.testing.assert_array_equal(a.lmk2, b.lmk2)
    np.testing.assert_allclose(a.off1, b.off1, atol=atol)
    np.testing.assert_allclose(a.off2, b.off2, atol=atol)
    np.testing.assert_array_equal(a.feat_th, b.feat_th)
    np.testing.assert_allclose(a.leaf_scores, b.leaf_scores, atol=atol)
    np.testing.assert_allclose(a.cart_th, b.cart_th, atol=atol)
    np.testing.assert_allclose(a.mean, b.mean, atol=atol)
    np.testing.assert_allclose(a.std, b.std, atol=atol)
    np.testing.assert_allclose(a.W, b.W, atol=atol)


def test_roundtrip_double(tmp_path):
    m = P.synthetic_model(T=2, K=6, landmark_n=5, seed=1)
    path = str(tmp_path / "m.model")
    P.save_model(m, path, dtype="double")
    m2 = P.load_model(path, dtype="double")
    _assert_params_equal(m, m2)


def test_roundtrip_float(tmp_path):
    m = P.synthetic_model(T=3, K=4, landmark_n=7, seed=2).astype(np.float32)
    path = str(tmp_path / "m.fmodel")
    P.save_model(m, path, dtype="float")
    m2 = P.load_model(path, dtype="float")
    _assert_params_equal(m.astype(np.float64), m2, atol=0.0)


def test_cursor_rollover(tmp_path):
    # (stage, K-1) is persisted as (stage+1, -1): cascador.cpp:93-104
    m = P.synthetic_model(T=2, K=6, landmark_n=5, seed=3)
    m.stage_idx, m.cart_idx = 1, 5  # K-1
    path = str(tmp_path / "m.model")
    P.save_model(m, path, dtype="double")
    m2 = P.load_model(path, dtype="double")
    assert (m2.stage_idx, m2.cart_idx) == (2, -1)


@pytest.mark.skipif(not oracle.available(), reason="reference not mounted")
def test_oracle_format_compat(tmp_path):
    """Our double-format file loads in the reference C parser, and the
    reference's float serialization loads back in ours with identical
    float32 values."""
    m = P.synthetic_model(
        T=oracle.T, K=oracle.K, landmark_n=oracle.LANDMARK_N, seed=4
    )
    dpath = str(tmp_path / "m.model")
    fpath = str(tmp_path / "m.fmodel")
    P.save_model(m, dpath, dtype="double")

    orc = oracle.Oracle(dpath, dtype="double")
    orc.serialize_float(fpath)
    del orc

    m2 = P.load_model(fpath, dtype="float")
    _assert_params_equal(m.astype(np.float32).astype(np.float64), m2)
