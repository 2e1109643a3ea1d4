"""Numerics core: SG lighting math, camera rays, BRDF shading, scale solvers."""

from inverserenderingofindoorscene_tpu.core import (  # noqa: F401
    brdf,
    camera,
    imageops,
    scale,
    sg,
    sphere,
)
