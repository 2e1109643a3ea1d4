from inverserenderingofindoorscene_tpu.pipeline.brdf import (
    BRDFNets,
    brdf_forward,
    brdf_step,
    prepare_cascade_input,
)
from inverserenderingofindoorscene_tpu.pipeline.inference import (
    InverseRenderer,
)
from inverserenderingofindoorscene_tpu.pipeline.light import (
    LightNets,
    light_forward,
    light_step,
)

__all__ = [
    "InverseRenderer",
    "BRDFNets",
    "brdf_forward",
    "brdf_step",
    "prepare_cascade_input",
    "LightNets",
    "light_forward",
    "light_step",
]
