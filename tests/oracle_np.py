"""Float64 numpy oracle for the SG lighting + shading equations.

Written directly from the reference equations (cited per function) in plain
numpy, independent of the JAX implementation, so kernel and jnp paths can
both be validated against it.  Layouts are NHWC / pixel-leading like the
framework (NOT the reference's NCHW).
"""

from __future__ import annotations

import numpy as np


def hemisphere_dirs_np(env_height=8, env_width=16):
    az = ((np.arange(env_width) + 0.5) / env_width - 0.5) * 2 * np.pi
    el = ((np.arange(env_height) + 0.5) / env_height) * np.pi / 2.0
    az, el = np.meshgrid(az, el)
    ls = np.stack(
        [np.sin(el) * np.cos(az), np.sin(el) * np.sin(az), np.cos(el)], axis=-1
    )
    return ls.reshape(-1, 3)


def hemisphere_weights_np(env_height=8, env_width=16):
    az = ((np.arange(env_width) + 0.5) / env_width - 0.5) * 2 * np.pi
    el = ((np.arange(env_height) + 0.5) / env_height) * np.pi / 2.0
    az, el = np.meshgrid(az, el)
    return (np.sin(el) * np.pi * np.pi / env_width / env_height).reshape(-1)


def sg_to_envmap_np(axis, lamb, weight, env_height=8, env_width=16):
    """axis [..., sg, 3], lamb [..., sg], weight [..., sg, 3] (un-squashed).

    env(l) = sum_k w_k exp(lamb_k (axis_k . l - 1))   [models.py:371-389]
    Returns [..., D, 3].
    """
    ls = hemisphere_dirs_np(env_height, env_width)  # [D,3]
    cos = np.einsum("...kc,dc->...kd", axis, ls)
    e = np.exp(lamb[..., :, None] * (cos - 1.0))
    return np.einsum("...kd,...kc->...dc", e, weight)


def unsquash_np(x):
    return np.tan(np.pi / 2.0 * 0.999 * x)


def view_dirs_np(height, width, fov_deg=57.0):
    fov = fov_deg / 180.0 * np.pi
    xr = np.tan(fov / 2.0)
    yr = float(height) / float(width) * xr
    x, y = np.meshgrid(np.linspace(-xr, xr, width), np.linspace(-yr, yr, height))
    y = np.flip(y, axis=0)
    p = np.stack([x, y, -np.ones_like(x)], axis=-1)
    return -p / np.sqrt(np.maximum(np.sum(p * p, axis=-1, keepdims=True), 1e-12))


def render_envmap_np(albedo, normal, rough, envmap, fov_deg=57.0, f0=0.05,
                     env_height=8, env_width=16):
    """NHWC shading oracle; equations from models.py:461-522.

    albedo [B,H,W,3], normal [B,H,W,3], rough [B,H,W,1],
    envmap [B,H,W,D,3]. Returns (diffuse, specular) [B,H,W,3].
    """
    b, h, w, _ = albedo.shape
    ls = hemisphere_dirs_np(env_height, env_width)
    wgt = hemisphere_weights_np(env_height, env_width)
    v = view_dirs_np(h, w, fov_deg)  # [H,W,3]

    normal = normal / np.sqrt(
        np.clip(np.sum(normal**2, axis=-1, keepdims=True), 1e-6, 1.0)
    )

    up = np.array([0.0, 1.0, 0.0])
    proj = np.sum(up * normal, axis=-1, keepdims=True) * normal
    camy = up - proj
    camy = camy / np.maximum(
        np.linalg.norm(camy, axis=-1, keepdims=True), 1e-12
    )
    cx = np.cross(camy, normal)
    camx = -cx / np.maximum(np.linalg.norm(cx, axis=-1, keepdims=True), 1e-12)

    l = (
        ls[:, 0, None] * camx[..., None, :]
        + ls[:, 1, None] * camy[..., None, :]
        + ls[:, 2, None] * normal[..., None, :]
    )  # [B,H,W,D,3]

    hv = (v[..., None, :] + l) / 2.0
    hv = hv / np.sqrt(
        np.maximum(np.sum(hv * hv, axis=-1, keepdims=True), 1e-6)
    )

    vdh = np.sum(v[..., None, :] * hv, axis=-1)
    frac0 = f0 + (1 - f0) * np.power(2.0, (-5.55472 * vdh - 6.98316) * vdh)

    diffuse_b = albedo / np.pi
    r = (rough[..., 0] + 1.0) / 2.0
    k = (r + 1.0) ** 2 / 8.0
    alpha2 = (r * r) ** 2

    ndv = np.clip(np.sum(normal * v, axis=-1), 0, 1)
    ndh = np.clip(np.sum(normal[..., None, :] * hv, axis=-1), 0, 1)
    ndl = np.clip(np.sum(normal[..., None, :] * l, axis=-1), 0, 1)

    frac = alpha2[..., None] * frac0
    nom0 = ndh * ndh * (alpha2[..., None] - 1) + 1
    nom1 = ndv[..., None] * (1 - k[..., None]) + k[..., None]
    nom2 = ndl * (1 - k[..., None]) + k[..., None]
    nom = np.clip(4 * np.pi * nom0 * nom0 * nom1 * nom2, 1e-6, 4 * np.pi)
    spec = frac / nom

    env_w = envmap * wgt[:, None]
    diffuse = diffuse_b * np.sum(ndl[..., None] * env_w, axis=-2)
    specular = np.sum((spec * ndl)[..., None] * env_w, axis=-2)
    return diffuse, specular
