"""jda_tpu — TPU-native Joint Cascade Face Detection and Alignment.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of luoyetx/JDA
(ECCV'14 "Joint Cascade Face Detection and Alignment"): a boosted cascade of
classification-regression trees that jointly classifies face/non-face windows
and regresses 2D landmark shapes, trained with RealBoost + hard-negative
mining + per-stage global linear regression over local binary features.

Design stance (TPU-first, not a translation):
  * The model is a structure-of-arrays tensor bundle (`CascadeParams`) instead
    of pointer-linked tree objects, so the whole T*K-cart cascade evaluates as
    branchless lockstep tensor ops over a *batch* of candidate windows.
  * Sliding-window detection materialises all (scale, x, y) candidates as a
    batch; early rejection becomes masked execution + periodic compaction.
  * Shape updates are one-hot x dense matmuls on the MXU.
  * Training split-search is a weighted-histogram reduction (scatter/matmul)
    over (feature, sample) matrices, data-parallel over a `jax.sharding.Mesh`.

Public surface mirrors the reference C API (/root/reference/c/jda.h:31-68):
load a binary model, detect -> bboxes + landmarks + scores.
"""

from jda_tpu.config import Config
from jda_tpu.params import (
    CascadeParams,
    load_model,
    save_model,
    synthetic_model,
    realistic_drop_profile,
)
from jda_tpu.detect import Detector, DetectionResult, detect

__version__ = "0.1.0"

__all__ = [
    "Config",
    "CascadeParams",
    "load_model",
    "save_model",
    "synthetic_model",
    "realistic_drop_profile",
    "Detector",
    "DetectionResult",
    "detect",
    # heavier surfaces imported lazily to keep `import jda_tpu` light:
    # jda_tpu.cascador.CppDetector, jda_tpu.fddb.run_fddb,
    # jda_tpu.train.boost.Trainer, jda_tpu.data.DataSet,
    # jda_tpu.native.NativeDetector, jda_tpu.cli.main
]
