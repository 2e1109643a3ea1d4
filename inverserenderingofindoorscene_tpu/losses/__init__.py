from inverserenderingofindoorscene_tpu.losses.masked import (
    masked_sq_sum,
    brdf_errors,
    envmap_reconst_error,
    render_error,
)
from inverserenderingofindoorscene_tpu.losses.ranking import batch_ranking_loss

__all__ = [
    "masked_sq_sum",
    "brdf_errors",
    "envmap_reconst_error",
    "render_error",
    "batch_ranking_loss",
]
