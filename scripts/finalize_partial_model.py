"""Turn a mid-training model snapshot into a deployable cascade.

A snapshot taken mid-stage carries the training cursor (stage_idx,
cart_idx) and zero-initialized parameters for every cart past it.  Those
zeros are NOT inert at detection time (cart_th = 0 rejects any window
whose running score is negative), so this tool rewrites every untrained
cart as an exact pass-through (leaf scores 0, mean 0, std 1, threshold
-inf) — the same trick the trainer uses when the hard-negative supply is
exhausted (train/boost.py) — and advances the cursor to "complete".

Usage: python scripts/finalize_partial_model.py in.model out.model
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jda_tpu.params import load_model, save_model  # noqa: E402


def finalize(src: str, dst: str) -> None:
    m = load_model(src)
    t0, k0 = m.stage_idx, m.cart_idx
    n_inert = 0
    for t in range(m.T):
        for k in range(m.K):
            trained = (t < t0) or (t == t0 and k <= k0)
            if trained:
                continue
            m.leaf_scores[t, k] = 0.0
            m.mean[t, k] = 0.0
            m.std[t, k] = 1.0
            m.cart_th[t, k] = -np.inf
            n_inert += 1
    # untrained stages also have W == 0 -> zero delta shape: harmless
    m.stage_idx, m.cart_idx = m.T, -1
    save_model(m, dst, dtype="double")
    print(
        f"{src} (cursor stage {t0} cart {k0}) -> {dst}: "
        f"{m.T * m.K - n_inert} trained carts, {n_inert} pass-through"
    )


if __name__ == "__main__":
    finalize(sys.argv[1], sys.argv[2])
