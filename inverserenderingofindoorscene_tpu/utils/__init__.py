from inverserenderingofindoorscene_tpu.utils.io import (
    envmap_mosaic,
    pred_to_shading,
    srgb2rgb,
    write_envmap_mosaic,
    write_h5,
    write_image,
)
from inverserenderingofindoorscene_tpu.utils.logging import MetricLogger

__all__ = [
    "srgb2rgb",
    "write_image",
    "write_h5",
    "envmap_mosaic",
    "write_envmap_mosaic",
    "pred_to_shading",
    "MetricLogger",
]
