"""Spherical-Gaussian lighting parameterization.

Per pixel the spatially-varying lighting is a mixture of ``sg_num`` (=12)
spherical-Gaussian lobes, each with a unit axis in the *local tangent frame*
of the pixel, a sharpness ``lamb`` and an RGB ``weight``:

    L(l) = sum_k  weight_k * exp(lamb_k * (dot(axis_k, l) - 1))

The network emits axis (unit-normalized), and lamb/weight squashed to [0, 1];
the physical values are recovered with ``tan(pi/2 * 0.999 * x)``.

Semantics match the reference ``output2env`` (/root/reference/models.py:348-404),
re-designed with NHWC/pixel-last layouts for TPU: all arrays carry pixels in
leading dims and the small SG/direction axes last so XLA maps the contraction
onto VPU lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from inverserenderingofindoorscene_tpu.core.sphere import hemisphere_dirs

TAN_SQUASH_EPS = 0.999


def unsquash(x: jnp.ndarray) -> jnp.ndarray:
    """Map a [0,1]-squashed network output to [0, +inf): tan(pi/2 * 0.999 x)."""
    return jnp.tan((np.pi / 2.0) * (TAN_SQUASH_EPS * x))


def sg_params_from_flat(flat: jnp.ndarray, sg_num: int = 12):
    """Split a flat [..., sg_num*7] SG tensor into (axis, lamb, weight).

    Layout: [axis(sg*3) | lamb(sg) | weight(sg*3)], matching the cascade
    hand-off tensor of the reference (wrapperBRDFLight.py:168).
    Returns axis [..., sg, 3], lamb [..., sg], weight [..., sg, 3].
    """
    ax = flat[..., : sg_num * 3].reshape(*flat.shape[:-1], sg_num, 3)
    lamb = flat[..., sg_num * 3 : sg_num * 4]
    w = flat[..., sg_num * 4 :].reshape(*flat.shape[:-1], sg_num, 3)
    return ax, lamb, w


def sg_to_envmap(
    axis: jnp.ndarray,
    lamb: jnp.ndarray,
    weight: jnp.ndarray,
    env_height: int = 8,
    env_width: int = 16,
) -> jnp.ndarray:
    """Evaluate the SG mixture on the hemisphere grid.

    Args:
      axis:   [..., sg, 3] unit lobe axes (local frame).
      lamb:   [..., sg] sharpness (already un-squashed, >= 0).
      weight: [..., sg, 3] RGB lobe amplitudes (un-squashed).

    Returns: envmap [..., env_height*env_width, 3].

    Equivalent to the reference ``fromSGtoIm`` (models.py:371-389) but the
    [.., sg, 3, H, W, eh, ew] broadcast intermediate is avoided: the lobe
    axis is contracted immediately so the peak live tensor is
    [..., sg, dirs] rather than the reference's 7-D broadcast.
    """
    ls = jnp.asarray(hemisphere_dirs(env_height, env_width), dtype=axis.dtype)
    # cos between each lobe axis and each direction: [..., sg, dirs]
    cos = jnp.einsum("...kc,dc->...kd", axis, ls)
    mi = lamb[..., :, None] * (cos - 1.0)  # [..., sg, dirs]
    e = jnp.exp(mi)
    # [..., sg, dirs] x [..., sg, 3] -> [..., dirs, 3]
    return jnp.einsum("...kd,...kc->...dc", e, weight)


def squashed_sg_to_envmap(
    axis: jnp.ndarray,
    lamb01: jnp.ndarray,
    weight01: jnp.ndarray,
    env_height: int = 8,
    env_width: int = 16,
):
    """Reference ``output2env``: un-squash lamb/weight then evaluate.

    Returns (envmap [..., dirs, 3], axis, lamb, weight) with the un-squashed
    lamb/weight, mirroring models.py:391-404.
    """
    lamb = unsquash(lamb01)
    weight = unsquash(weight01)
    env = sg_to_envmap(axis, lamb, weight, env_height, env_width)
    return env, axis, lamb, weight
