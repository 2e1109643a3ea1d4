"""Flax network modules: MGNet (BRDF), LightNet (SG lighting), confidence CNN."""

from inverserenderingofindoorscene_tpu.models.mgnet import (  # noqa: F401
    Decoder,
    Encoder,
    apply_head,
)
from inverserenderingofindoorscene_tpu.models.lightnet import (  # noqa: F401
    LightDecoder,
    LightEncoder,
)
