"""Native (C) components of the runtime.

Currently: the RGBE (.hdr) decoder with fused envmap pooling
(:mod:`inverserenderingofindoorscene_tpu.native.hdr`), replacing the
cv2-decode + numpy-pool path that starves the input pipeline.
"""

from inverserenderingofindoorscene_tpu.native.hdr import (  # noqa: F401
    decode_rgbe,
    decode_rgbe_pooled,
    native_available,
)
