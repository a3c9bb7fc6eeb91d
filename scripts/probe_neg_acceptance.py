"""Diagnostic: per-mode acceptance of hard-negative candidates vs a model.

Measures, for each make_near_miss mode x difficulty, the fraction of
candidates the given partial cascade still accepts — the quantity that
sets hard-negative mining wall-clock (each mining event costs
~1/acceptance host-rendered candidates).  Also probes the POSITIVE
distribution (make_face) as the acceptance ceiling.

Usage: python scripts/probe_neg_acceptance.py models/snapshots/jda_tmp_*.model
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    from jda_tpu.data import patch_row
    from jda_tpu.params import load_model
    from jda_tpu.train.boost import Trainer
    from scripts.train_flagship import flagship_config, make_face, make_near_miss

    model_path = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    c = flagship_config()
    tr = Trainer(c)
    tr.model = load_model(model_path)
    # make_validator takes the cursor directly: stage_idx completed
    # stages plus carts [0, cart_idx] of the partial stage (cart_idx=-1
    # at a stage boundary)
    stage = tr.model.stage_idx
    cart = tr.model.cart_idx
    print(f"model cursor: stage_idx={tr.model.stage_idx} cart_idx={tr.model.cart_idx}")
    validator = tr.make_validator(stage, cart)

    rng = np.random.default_rng(42)

    def accept_rate(gen):
        rows = np.stack([patch_row(gen(), c) for _ in range(n)])
        ok, score, _, nvis = validator(rows)
        return float(ok.mean()), float(nvis.mean()), float(np.median(score[ok])) if ok.any() else float("nan")

    t0 = time.time()
    r, v, s = accept_rate(lambda: make_face(rng, c.img_o_size)[0])
    print(f"positives (make_face)        : accept={r:.4f}  carts-visited={v:7.1f}  med-score={s:+.2f}")
    for mode in range(5):
        for d in (0.0, 0.5, 1.0):
            r, v, s = accept_rate(
                lambda: make_near_miss(rng, c.img_o_size, d, mode=mode)
            )
            print(
                f"near-miss mode {mode} d={d:.1f}      : accept={r:.4f}  carts-visited={v:7.1f}  med-score={s:+.2f}"
            )
    print(f"total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
