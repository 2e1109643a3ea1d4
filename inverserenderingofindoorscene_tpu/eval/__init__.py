from inverserenderingofindoorscene_tpu.eval.metrics import (
    compute_whdr,
    normal_angle_error,
    si_log_depth_rmse,
)

__all__ = ["compute_whdr", "normal_angle_error", "si_log_depth_rmse"]
