"""Differentiable per-pixel shading against a hemisphere envmap.

Evaluates a Lambertian + GGX microfacet BRDF against the per-pixel
``env_height x env_width`` environment map and integrates with the
solid-angle quadrature weights, returning separate diffuse and specular
images.  This is the pure-jnp correctness anchor for the fused Pallas
kernel in ``ops/sg_render.py``; semantics match the reference
``renderingLayer.forwardEnv`` (/root/reference/models.py:461-522):

  * tangent frame from the normal with up=(0,1,0):
      camy = normalize(up - (up.n) n),  camx = -normalize(camy x n)
  * world light dir l = lx*camx + ly*camy + lz*n
  * half vector h = normalize((v + l)/2)
  * Schlick Fresnel with F0 and the 2^((-5.55472 vdh - 6.98316) vdh) approx
  * GGX D/G with k = (r+1)^2/8, alpha = r^2 (r in [0,1])
  * spec = alpha^2 * F / clamp(4 pi (ndh^2(alpha^2-1)+1)^2
                               * (ndv(1-k)+k) * (ndl(1-k)+k), 1e-6, 4 pi)
  * out_d = sum_l albedo/pi * ndl * env(l) * w(l)
    out_s = sum_l spec      * ndl * env(l) * w(l)

All tensors are pixel-leading ([..., H, W, C]); the direction axis is kept
last-but-one so the 128-direction reduction vectorizes on TPU lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from inverserenderingofindoorscene_tpu.core.camera import view_dirs
from inverserenderingofindoorscene_tpu.core.sphere import (
    hemisphere_dirs,
    hemisphere_weights,
)

UP = np.array([0.0, 1.0, 0.0])


def tangent_frame(normal: jnp.ndarray):
    """Per-pixel tangent frame (camx, camy) for z = normal.

    normal: [..., 3] unit normals. Returns (camx, camy) each [..., 3].
    """
    up = jnp.asarray(UP, dtype=normal.dtype)
    proj = jnp.sum(up * normal, axis=-1, keepdims=True) * normal
    camy = up - proj
    camy = camy / jnp.linalg.norm(camy, axis=-1, keepdims=True).clip(1e-12)
    camx = -jnp.cross(camy, normal)
    camx = camx / jnp.linalg.norm(camx, axis=-1, keepdims=True).clip(1e-12)
    return camx, camy


def render_envmap(
    albedo: jnp.ndarray,
    normal: jnp.ndarray,
    rough: jnp.ndarray,
    envmap: jnp.ndarray,
    fov_deg: float = 57.0,
    f0: float = 0.05,
    env_height: int = 8,
    env_width: int = 16,
):
    """Shade each pixel against its environment map.

    Args:
      albedo: [B, H, W, 3] in [0, 1].
      normal: [B, H, W, 3] (re-normalized inside, like the reference).
      rough:  [B, H, W, 1] in [-1, 1] (network output range).
      envmap: [B, H, W, D, 3] with D = env_height*env_width.

    Returns (diffuse, specular), each [B, H, W, 3].
    """
    h_img, w_img = albedo.shape[-3], albedo.shape[-2]
    dtype = albedo.dtype
    ls = jnp.asarray(hemisphere_dirs(env_height, env_width), dtype)  # [D,3]
    wgt = jnp.asarray(hemisphere_weights(env_height, env_width), dtype)  # [D]
    v = jnp.asarray(view_dirs(h_img, w_img, fov_deg), dtype)  # [H,W,3]

    normal = normal / jnp.sqrt(
        jnp.clip(jnp.sum(normal * normal, axis=-1, keepdims=True), 1e-6, 1.0)
    )

    camx, camy = tangent_frame(normal)  # [B,H,W,3]

    # World-space light directions: [B,H,W,D,3]
    l = (
        ls[:, 0, None] * camx[..., None, :]
        + ls[:, 1, None] * camy[..., None, :]
        + ls[:, 2, None] * normal[..., None, :]
    )

    h = (v[..., None, :] + l) / 2.0
    h = h / jnp.sqrt(
        jnp.clip(jnp.sum(h * h, axis=-1, keepdims=True), 1e-6, None)
    )

    vdh = jnp.sum(v[..., None, :] * h, axis=-1)  # [B,H,W,D]
    frac0 = f0 + (1.0 - f0) * jnp.power(
        jnp.asarray(2.0, dtype), (-5.55472 * vdh - 6.98316) * vdh
    )

    diffuse_b = albedo / np.pi  # [B,H,W,3]
    r = (rough[..., 0] + 1.0) / 2.0  # [B,H,W]
    k = (r + 1.0) ** 2 / 8.0
    alpha2 = (r * r) ** 2

    ndv = jnp.clip(jnp.sum(normal * v, axis=-1), 0.0, 1.0)  # [B,H,W]
    ndh = jnp.clip(jnp.sum(normal[..., None, :] * h, axis=-1), 0.0, 1.0)
    ndl = jnp.clip(jnp.sum(normal[..., None, :] * l, axis=-1), 0.0, 1.0)

    frac = alpha2[..., None] * frac0  # [B,H,W,D]
    nom0 = ndh * ndh * (alpha2[..., None] - 1.0) + 1.0
    nom1 = ndv[..., None] * (1.0 - k[..., None]) + k[..., None]
    nom2 = ndl * (1.0 - k[..., None]) + k[..., None]
    nom = jnp.clip(4.0 * np.pi * nom0 * nom0 * nom1 * nom2, 1e-6, 4.0 * np.pi)
    spec = frac / nom  # [B,H,W,D]

    env_w = envmap * wgt[:, None]  # [B,H,W,D,3]
    ndl_w = ndl[..., None]  # [B,H,W,D,1]
    diffuse = diffuse_b * jnp.sum(ndl_w * env_w, axis=-2)
    specular = jnp.sum((spec * ndl)[..., None] * env_w, axis=-2)
    return diffuse, specular
