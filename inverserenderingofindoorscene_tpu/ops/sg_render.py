"""Fused Pallas TPU kernels for the SG-lighting shading integral.

The reference implements this as two chained torch ops with gigantic
broadcast intermediates: ``output2env.fromSGtoIm`` materializes
[B,12,3,120,160,8,16] (/root/reference/models.py:371-389) and
``renderingLayer.forwardEnv`` another batch of [B,..,128]-direction tensors
(models.py:461-522).  Here both are fused into ONE kernel over pixel tiles:
for each tile of P pixels every per-direction array lives in VMEM as a
[P, 128] tile (128 directions == the TPU lane width), the 12-lobe SG
mixture is accumulated in registers, and only the [P, 3] diffuse/specular
results are written back to HBM.  The backward pass is a second fused
kernel that RECOMPUTES the tile forward and applies in-kernel reverse-mode
AD (jax.vjp of the tile function), so no forward residuals are stored —
the rematerialization trades ~2x FLOPs for zero HBM residual traffic,
which is the right trade on TPU where this op is bandwidth-bound.

Semantics (and allclose targets) are the pure-jnp implementations in
``core/sg.py`` + ``core/brdf.py``, themselves validated against the torch
reference including gradients.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from inverserenderingofindoorscene_tpu.core.camera import view_dirs
from inverserenderingofindoorscene_tpu.core.sphere import (
    hemisphere_dirs,
    hemisphere_weights,
)

# Pixels per grid step. 128 f32 sublanes x 128 lanes keeps every
# per-direction temporary at a single (8,128)-aligned VMEM tile stack.
TILE_P = 128


def pack_dir_consts(env_height, env_width, dtype=np.float32):
    """[8, D] constant input: rows 0-2 = light dirs xyz, row 3 = solid-angle
    weights, rows 4-7 zero padding (8 sublanes = f32 min tile)."""
    ls = hemisphere_dirs(env_height, env_width)
    wq = hemisphere_weights(env_height, env_width)
    d = ls.shape[0]
    out = np.zeros((8, d), dtype)
    out[0:3] = ls.T
    out[3] = wq
    return out


def _shade_tile_math(albedo, normal, rough, axis, lamb, weight, v, consts, f0):
    """Shade a tile of P pixels. All per-direction arrays are [P, D].

    albedo/normal/v: [P,3]; rough: [P,1]; axis: [P,K*3]; lamb: [P,K];
    weight: [P,K*3]; consts: [8,D] packed dirs+weights (pack_dir_consts).

    Returns (diffuse [P,3], specular [P,3]).
    Equations: models.py:461-522 + 371-404 (see core/brdf.py docstring).
    """
    p = albedo.shape[0]
    k_num = lamb.shape[-1]
    d = consts.shape[-1]
    lsx = consts[0:1, :]
    lsy = consts[1:2, :]
    lsz = consts[2:3, :]
    wgt_row = consts[3:4, :]

    def col(x, i):
        return x[:, i : i + 1]  # [P,1] static slice

    # --- normalize normal (models.py:478) ---
    nx, ny, nz = col(normal, 0), col(normal, 1), col(normal, 2)
    inv_n = jax.lax.rsqrt(jnp.clip(nx * nx + ny * ny + nz * nz, 1e-6, 1.0))
    nx, ny, nz = nx * inv_n, ny * inv_n, nz * inv_n

    # --- tangent frame: up=(0,1,0) (models.py:479-484) ---
    # camy = normalize(up - (up.n) n); camx = -normalize(camy x n)
    cyx = -ny * nx
    cyy = 1.0 - ny * ny
    cyz = -ny * nz
    inv_cy = jax.lax.rsqrt(
        jnp.clip(cyx * cyx + cyy * cyy + cyz * cyz, 1e-12, None)
    )
    cyx, cyy, cyz = cyx * inv_cy, cyy * inv_cy, cyz * inv_cy
    # cross(camy, n)
    cxx = cyy * nz - cyz * ny
    cxy = cyz * nx - cyx * nz
    cxz = cyx * ny - cyy * nx
    inv_cx = jax.lax.rsqrt(
        jnp.clip(cxx * cxx + cxy * cxy + cxz * cxz, 1e-12, None)
    )
    cxx, cxy, cxz = -cxx * inv_cx, -cxy * inv_cx, -cxz * inv_cx

    # --- SG mixture -> per-direction radiance env_c [P,D] (models.py:371-389)
    env_r = jnp.zeros((p, d), albedo.dtype)
    env_g = jnp.zeros((p, d), albedo.dtype)
    env_b = jnp.zeros((p, d), albedo.dtype)
    for k in range(k_num):
        ax, ay, az = col(axis, 3 * k), col(axis, 3 * k + 1), col(axis, 3 * k + 2)
        cos = ax * lsx + ay * lsy + az * lsz  # [P,D]
        e = jnp.exp(col(lamb, k) * (cos - 1.0))
        env_r = env_r + col(weight, 3 * k) * e
        env_g = env_g + col(weight, 3 * k + 1) * e
        env_b = env_b + col(weight, 3 * k + 2) * e

    # --- world light dirs l = lx*camx + ly*camy + lz*n (models.py:485-487)
    lx = lsx * cxx + lsy * cyx + lsz * nx  # [P,D]
    ly = lsx * cxy + lsy * cyy + lsz * ny
    lz = lsx * cxz + lsy * cyz + lsz * nz

    vx, vy, vz = col(v, 0), col(v, 1), col(v, 2)
    hx, hy, hz = (vx + lx) * 0.5, (vy + ly) * 0.5, (vz + lz) * 0.5
    inv_h = jax.lax.rsqrt(jnp.clip(hx * hx + hy * hy + hz * hz, 1e-6, None))
    hx, hy, hz = hx * inv_h, hy * inv_h, hz * inv_h

    vdh = vx * hx + vy * hy + vz * hz
    # Schlick-ish Fresnel (models.py:491)
    frac0 = f0 + (1.0 - f0) * jnp.exp2((-5.55472 * vdh - 6.98316) * vdh)

    r = (rough + 1.0) * 0.5  # [P,1]
    k_g = (r + 1.0) * (r + 1.0) * (1.0 / 8.0)
    alpha2 = (r * r) * (r * r)

    ndv = jnp.clip(nx * vx + ny * vy + nz * vz, 0.0, 1.0)  # [P,1]
    ndh = jnp.clip(nx * hx + ny * hy + nz * hz, 0.0, 1.0)  # [P,D]
    ndl = jnp.clip(nx * lx + ny * ly + nz * lz, 0.0, 1.0)  # [P,D]

    frac = alpha2 * frac0
    nom0 = ndh * ndh * (alpha2 - 1.0) + 1.0
    nom1 = ndv * (1.0 - k_g) + k_g
    nom2 = ndl * (1.0 - k_g) + k_g
    four_pi = 4.0 * np.pi
    nom = jnp.clip(four_pi * nom0 * nom0 * nom1 * nom2, 1e-6, four_pi)
    spec = frac / nom  # [P,D]

    ndl_w = ndl * wgt_row  # [P,D]
    spec_w = spec * ndl_w
    inv_pi = 1.0 / np.pi

    def reduce3(wmap):
        return jnp.concatenate(
            [
                jnp.sum(wmap * env_r, axis=1, keepdims=True),
                jnp.sum(wmap * env_g, axis=1, keepdims=True),
                jnp.sum(wmap * env_b, axis=1, keepdims=True),
            ],
            axis=1,
        )  # [P,3]

    diffuse = albedo * inv_pi * reduce3(ndl_w)
    specular = reduce3(spec_w)
    return diffuse, specular


def _fwd_kernel(consts, alb, nrm, rgh, ax, lam, wgt_in, v, dif, spc, *, f0):
    d, s = _shade_tile_math(
        alb[:], nrm[:], rgh[:], ax[:], lam[:], wgt_in[:], v[:], consts[:], f0
    )
    dif[:] = d
    spc[:] = s


def _bwd_kernel(
    consts, alb, nrm, rgh, ax, lam, wgt_in, v, gd, gs,
    dalb, dnrm, drgh, dax, dlam, dwgt, *, f0,
):
    def f(a, n, r, x, lm, w):
        return _shade_tile_math(a, n, r, x, lm, w, v[:], consts[:], f0)

    _, vjp = jax.vjp(f, alb[:], nrm[:], rgh[:], ax[:], lam[:], wgt_in[:])
    ga, gn, gr, gx, gl, gw = vjp((gd[:], gs[:]))
    dalb[:] = ga
    dnrm[:] = gn
    drgh[:] = gr
    dax[:] = gx
    dlam[:] = gl
    dwgt[:] = gw


def _pad_to(x, n):
    if x.shape[0] == n:
        return x
    return jnp.pad(x, ((0, n - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _flat_specs(n_tiles, widths):
    return [
        pl.BlockSpec((TILE_P, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for w in widths
    ]


def _const_spec(d):
    # Same [8, D] dirs+weights block every grid step.
    return pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _run_fwd(albedo, normal, rough, axis, lamb, weight, v, env_hw, f0,
             interpret):
    eh, ew = env_hw
    consts = jnp.asarray(pack_dir_consts(eh, ew), albedo.dtype)
    n = albedo.shape[0]
    n_pad = ((n + TILE_P - 1) // TILE_P) * TILE_P
    args = [
        _pad_to(albedo, n_pad),
        _pad_to(normal, n_pad),
        _pad_to(rough, n_pad),
        _pad_to(axis, n_pad),
        _pad_to(lamb, n_pad),
        _pad_to(weight, n_pad),
        _pad_to(v, n_pad),
    ]
    widths = [a.shape[1] for a in args]
    k = lamb.shape[1]
    grid = (n_pad // TILE_P,)
    kernel = functools.partial(_fwd_kernel, f0=f0)
    dif, spc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_const_spec(consts.shape[1])] + _flat_specs(grid[0], widths),
        out_specs=tuple(_flat_specs(grid[0], [3, 3])),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 3), albedo.dtype),
            jax.ShapeDtypeStruct((n_pad, 3), albedo.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_pad * (k * 8 + 45) * eh * ew,
            bytes_accessed=sum(w * 4 for w in widths) * n_pad + n_pad * 24,
            transcendentals=n_pad * (k + 2) * eh * ew,
        ),
    )(consts, *args)
    return dif[:n], spc[:n]


def _sg_render_bwd(v, env_hw, f0, interpret, res, grads):
    albedo, normal, rough, axis, lamb, weight = res
    gd, gs = grads
    eh, ew = env_hw
    consts = jnp.asarray(pack_dir_consts(eh, ew), albedo.dtype)
    n = albedo.shape[0]
    n_pad = ((n + TILE_P - 1) // TILE_P) * TILE_P
    args = [
        _pad_to(albedo, n_pad),
        _pad_to(normal, n_pad),
        _pad_to(rough, n_pad),
        _pad_to(axis, n_pad),
        _pad_to(lamb, n_pad),
        _pad_to(weight, n_pad),
        _pad_to(v, n_pad),
        _pad_to(gd, n_pad),
        _pad_to(gs, n_pad),
    ]
    in_widths = [a.shape[1] for a in args]
    out_widths = [a.shape[1] for a in args[:6]]
    k = lamb.shape[1]
    grid = (n_pad // TILE_P,)
    kernel = functools.partial(_bwd_kernel, f0=f0)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_const_spec(consts.shape[1])]
        + _flat_specs(grid[0], in_widths),
        out_specs=tuple(_flat_specs(grid[0], out_widths)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_pad, w), albedo.dtype) for w in out_widths
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * n_pad * (k * 8 + 45) * eh * ew,
            bytes_accessed=sum(w * 4 for w in in_widths + out_widths) * n_pad,
            transcendentals=2 * n_pad * (k + 2) * eh * ew,
        ),
    )(consts, *args)
    return tuple(o[:n] for o in outs)


class _SGRender:
    """custom_vjp wrapper keyed on the static config (env_hw, f0, interpret)."""

    def __init__(self, env_hw: Tuple[int, int], f0: float, interpret: bool):
        self.env_hw = env_hw
        self.f0 = f0
        self.interpret = interpret

        @jax.custom_vjp
        def op(albedo, normal, rough, axis, lamb, weight, v):
            return _run_fwd(albedo, normal, rough, axis, lamb, weight, v,
                            env_hw, f0, interpret)

        def fwd(albedo, normal, rough, axis, lamb, weight, v):
            out = _run_fwd(albedo, normal, rough, axis, lamb, weight, v,
                           env_hw, f0, interpret)
            return out, (albedo, normal, rough, axis, lamb, weight, v)

        def bwd(res, grads):
            a, nr, r, x, lm, w, v = res
            gs = _sg_render_bwd(v, env_hw, f0, interpret, (a, nr, r, x, lm, w),
                                grads)
            return gs + (jnp.zeros_like(v),)

        op.defvjp(fwd, bwd)
        self.op = op


@functools.lru_cache(maxsize=None)
def _get_op(env_hw, f0, interpret):
    return _SGRender(env_hw, f0, interpret).op


def render_sg(
    albedo: jnp.ndarray,
    normal: jnp.ndarray,
    rough: jnp.ndarray,
    axis: jnp.ndarray,
    lamb: jnp.ndarray,
    weight: jnp.ndarray,
    fov_deg: float = 57.0,
    f0: float = 0.05,
    env_height: int = 8,
    env_width: int = 16,
    interpret: bool = False,
):
    """Fused SG->shading, NHWC API.

    albedo [B,H,W,3], normal [B,H,W,3], rough [B,H,W,1],
    axis [B,H,W,K,3], lamb [B,H,W,K] (physical sharpness),
    weight [B,H,W,K,3] (physical amplitude).
    Returns (diffuse, specular) [B,H,W,3].
    """
    b, h, w = albedo.shape[:3]
    n = b * h * w
    k = lamb.shape[-1]
    v = jnp.broadcast_to(
        jnp.asarray(view_dirs(h, w, fov_deg), albedo.dtype), (b, h, w, 3)
    ).reshape(n, 3)
    op = _get_op((env_height, env_width), float(f0), bool(interpret))
    dif, spc = op(
        albedo.reshape(n, 3),
        normal.reshape(n, 3),
        rough.reshape(n, 1),
        axis.reshape(n, k * 3),
        lamb.reshape(n, k),
        weight.reshape(n, k * 3),
        v,
    )
    return dif.reshape(b, h, w, 3), spc.reshape(b, h, w, 3)
