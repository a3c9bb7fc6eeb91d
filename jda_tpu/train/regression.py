"""Global shape regression over Local Binary Features.

The reference trains 2*landmark_n independent liblinear SVRs
(L2R_L2LOSS_SVR_DUAL, C=1/n, p=0 — /root/reference/src/jda/btcart.cpp:328-388)
on a K-hot design matrix (one leaf per cart).  With p=0 that solver's
objective is exactly L2-regularized least squares, so the TPU-native
equivalent is one closed-form ridge solve shared by all 2L targets:

    min_w  C * ||X w - y||^2 + 0.5 ||w||^2   ==   (X^T X + lam I) w = X^T y,
    lam = 1/(2C) = n/2.

X^T X is built by chunked one-hot matmuls on the MXU (it is the
co-occurrence count matrix of leaf pairs), one Cholesky solve covers every
target column.  SURVEY.md §7.8; exact SVR-dual iterate parity is
intentionally out of scope (SURVEY.md "liblinear replacement").
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("F",))
def _accumulate(leaves: jnp.ndarray, resid: jnp.ndarray, valid: jnp.ndarray, *, F: int):
    """One chunk's contribution to the normal equations.

    leaves [M, K] int32 (leaf index per cart, already offset by k*leaf_n),
    resid [M, 2L] f32, valid [M] f32 in {0, 1}.
    Returns (A_chunk [F, F], b_chunk [F, 2L]).
    """
    M = leaves.shape[0]
    E = jnp.zeros((M, F), jnp.float32)
    E = E.at[jnp.arange(M)[:, None], leaves].set(1.0)
    E = E * valid[:, None]
    A = jnp.dot(E.T, E, preferred_element_type=jnp.float32)
    b = jnp.dot(E.T, resid, preferred_element_type=jnp.float32)
    return A, b


@jax.jit
def _solve(A: jnp.ndarray, b: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    F = A.shape[0]
    A = A + lam * jnp.eye(F, dtype=A.dtype)
    return jax.scipy.linalg.solve(A, b, assume_a="pos")


def ridge_lbf(
    leaves: np.ndarray,  # [N, K] global leaf indices (k*leaf_n + leaf)
    residual: np.ndarray,  # [N, 2L]
    F: int,  # K * leaf_n
    lam: Optional[float] = None,
    chunk: int = 8192,
) -> np.ndarray:
    """Solve the LBF ridge regression; returns W [F, 2L] float64."""
    from jda_tpu.train.split import RESID_FRAC_BITS

    n = len(leaves)
    if lam is None:
        lam = n / 2.0  # liblinear C = 1/n  =>  lam = 1/(2C)
    # fixed-point residuals make the normal-equation sums exact in any
    # reduction order: single-chip (chunked) and mesh-sharded (psum'd)
    # accumulations produce bit-identical (A, b) and therefore identical W
    q = np.float32(1 << RESID_FRAC_BITS)
    residual = np.round(residual.astype(np.float32) * q) / q
    A = jnp.zeros((F, F), jnp.float32)
    b = jnp.zeros((F, residual.shape[1]), jnp.float32)
    for s0 in range(0, n, chunk):
        s1 = min(s0 + chunk, n)
        m = s1 - s0
        pad = chunk - m if (s1 == n and n > chunk) else 0
        lv = leaves[s0:s1]
        rs = residual[s0:s1]
        vd = np.ones(m, np.float32)
        if pad:
            lv = np.concatenate([lv, np.zeros((pad, lv.shape[1]), lv.dtype)])
            rs = np.concatenate([rs, np.zeros((pad, rs.shape[1]), rs.dtype)])
            vd = np.concatenate([vd, np.zeros(pad, np.float32)])
        dA, db = _accumulate(
            jnp.asarray(lv, jnp.int32),
            jnp.asarray(rs, jnp.float32),
            jnp.asarray(vd),
            F=F,
        )
        A = A + dA
        b = b + db
    W = _solve(A, b, jnp.float32(lam))
    return np.asarray(W, np.float64)
