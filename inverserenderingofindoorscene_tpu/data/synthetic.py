"""Deterministic synthetic scene batches.

Stand-in for the OpenRooms dataset with the exact tensor contract of the
real loader (dataLoader.py:118-215 semantics, NHWC layouts): used as the CI
fixture (the reference ships no test data) and as the benchmark input.
Value ranges mirror the loader outputs: im in [0,1] (HDR-scaled), albedo in
[0,1], unit normals, rough in [-1,1], depth positive, segs in {0,1}, env_gt
nonnegative HDR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_batch(
    batch: int = 2,
    im_hw=(240, 320),
    env_rc=(120, 160),
    env_hw=(8, 16),
    cascade_level: int = 0,
    sg_num: int = 12,
    seed: int = 0,
    dtype=jnp.float32,
):
    """Build a random-but-deterministic training batch (NHWC dict)."""
    rng = np.random.RandomState(seed)
    h, w = im_hw
    r, c = env_rc
    d = env_hw[0] * env_hw[1]

    def u(shape, lo=0.0, hi=1.0):
        return jnp.asarray(rng.uniform(lo, hi, shape), dtype)

    normal = rng.uniform(-1, 1, (batch, h, w, 3))
    normal[..., 2] = np.abs(normal[..., 2]) + 0.3
    normal = normal / np.linalg.norm(normal, axis=-1, keepdims=True)

    seg_obj = (rng.uniform(0, 1, (batch, h, w, 1)) > 0.3).astype(np.float64)
    seg_area = (rng.uniform(0, 1, (batch, h, w, 1)) > 0.8).astype(
        np.float64
    ) * (1.0 - seg_obj)
    seg_env = 1.0 - seg_obj - seg_area

    out = {
        "im": u((batch, h, w, 3)),
        "albedo": u((batch, h, w, 3)),
        "normal": jnp.asarray(normal, dtype),
        "rough": u((batch, h, w, 1), -1.0, 1.0),
        "depth": u((batch, h, w, 1), 0.1, 5.0),
        "seg_brdf": jnp.asarray(seg_obj, dtype),
        "seg_all": jnp.asarray(seg_obj + seg_area, dtype),
        "seg_env": jnp.asarray(seg_env, dtype),
        "env_gt": u((batch, r, c, d, 3), 0.0, 2.0),
        "env_ind": jnp.ones((batch, 1), dtype),
    }
    if cascade_level > 0:
        out.update(
            {
                "albedo_pre": u((batch, r, c, 3)),
                "normal_pre": jnp.asarray(
                    normal[:, ::2, ::2][:, : r, : c], dtype
                ),
                "rough_pre": u((batch, r, c, 1), -1.0, 1.0),
                "depth_pre": u((batch, r, c, 1), 0.1, 5.0),
                "diffuse_pre": u((batch, r, c, 3)),
                "specular_pre": u((batch, r, c, 3), 0.0, 0.5),
                "env_pre": u((batch, r, c, sg_num * 7)),
            }
        )
    return out
