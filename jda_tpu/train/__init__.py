"""Training stack: boosted classification-regression cascade on TPU.

Replaces the reference's OpenMP training loop
(/root/reference/src/jda/btcart.cpp, cart.cpp, data.cpp) with device-batched
tensor ops: feature matrices are batched 2-pixel gathers, split search is a
segment-sum histogram + masked scan reduction, global regression is a
closed-form ridge solve on the MXU, and hard-negative mining validates
host-proposed windows in device batches.
"""

from jda_tpu.train.features import (
    FeaturePool,
    gen_feature_pool,
    feature_values,
    corpus_geometry,
)
from jda_tpu.train.split import (
    classification_split,
    classification_split_from_hists,
    regression_split,
    leaf_scores,
)
from jda_tpu.train.dryrun import sharded_train_step_dryrun

__all__ = [
    "FeaturePool",
    "gen_feature_pool",
    "feature_values",
    "corpus_geometry",
    "classification_split",
    "regression_split",
    "leaf_scores",
    "sharded_train_step_dryrun",
]
