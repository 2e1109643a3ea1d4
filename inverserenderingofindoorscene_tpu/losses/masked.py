"""Masked scale-invariant losses with exact reference normalization.

All errors follow the reference convention: sum of masked squared error over
the WHOLE batch, divided by the GLOBAL masked pixel count (and channel
count), e.g. /root/reference/wrapperBRDF.py:118-134.  Under data-parallel
sharding the pixel count must be summed across chips before normalizing to
match reference numerics (SURVEY.md §7 hard-parts); pass ``axis_name`` when
calling inside ``shard_map`` and both the numerator and denominator are
``psum``-ed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core.scale import (
    ls_regress,
    ls_regress_diff_spec,
)


def _maybe_psum(x, axis_name: Optional[str]):
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def masked_sq_sum(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    seg: jnp.ndarray,
    channels: float = 1.0,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """sum((pred-gt)^2 * seg) / sum(seg) / channels  (global over batch).

    ``seg`` broadcasts against pred ([B,H,W,1] vs [B,H,W,C]).
    """
    num = jnp.sum((pred - gt) ** 2 * seg)
    den = jnp.sum(seg)
    num = _maybe_psum(num, axis_name)
    den = _maybe_psum(den, axis_name)
    return num / jnp.clip(den, 1e-5, None) / channels


def brdf_errors(
    albedo_pred: jnp.ndarray,
    normal_pred: jnp.ndarray,
    rough_pred: jnp.ndarray,
    depth_pred: jnp.ndarray,
    batch: dict,
    axis_name: Optional[str] = None,
):
    """The four masked BRDF errors of wrapperBRDF.py:107-134 (NHWC).

    batch keys: albedo/normal/rough/depth GT, seg_brdf (=segObj),
    seg_all (=segArea+segObj), each [B,H,W,C].

    Returns (errors dict, scaled preds dict).  The albedo/depth preds are
    LSregress-rescaled onto the GT under the mask before the error (albedo
    additionally clamped to [0,1]); gradients do not flow through the fitted
    coefficients.
    """
    seg_brdf = batch["seg_brdf"]
    seg_all = batch["seg_all"]

    albedo_gt = batch["albedo"] * seg_brdf
    albedo_p1 = ls_regress(
        jax.lax.stop_gradient(albedo_pred) * seg_brdf,
        albedo_gt * seg_brdf,
        albedo_pred,
    )
    albedo_p1 = jnp.clip(albedo_p1, 0.0, 1.0)

    depth_p1 = ls_regress(
        jax.lax.stop_gradient(depth_pred) * seg_all,
        batch["depth"] * seg_all,
        depth_pred,
    )

    errors = {
        "albedo": masked_sq_sum(albedo_p1, albedo_gt, seg_brdf, 3.0, axis_name),
        "normal": masked_sq_sum(
            normal_pred, batch["normal"], seg_all, 3.0, axis_name
        ),
        "rough": masked_sq_sum(
            rough_pred, batch["rough"], seg_brdf, 1.0, axis_name
        ),
        "depth": masked_sq_sum(
            jnp.log(depth_p1 + 1.0),
            jnp.log(batch["depth"] + 1.0),
            seg_all,
            1.0,
            axis_name,
        ),
    }
    scaled = {"albedo": albedo_p1, "depth": depth_p1}
    return errors, scaled


def envmap_reconst_error(
    env_pred: jnp.ndarray,
    env_gt: jnp.ndarray,
    seg_env: jnp.ndarray,
    offset: float = 1.0,
    axis_name: Optional[str] = None,
):
    """Log-space masked envmap reconstruction error.

    env_pred/env_gt: [B,R,C,D,3]; seg_env: [B,R,C,1] (already including the
    envmapsInd validity and notDarkEnv masks).  The prediction is first
    LSregress-scaled onto the GT under the mask.  Matches
    wrapperBRDFLight.py:178-188: / pixelNum / 3 / D.

    Returns (error, env_pred_scaled).
    """
    d = env_pred.shape[-2]
    seg5 = seg_env[..., None, :]  # [B,R,C,1,1]
    env_scaled = ls_regress(
        jax.lax.stop_gradient(env_pred) * seg5, env_gt * seg5, env_pred
    )
    num = jnp.sum(
        (jnp.log(env_scaled + offset) - jnp.log(env_gt + offset)) ** 2 * seg5
    )
    den = jnp.sum(seg_env)
    num = _maybe_psum(num, axis_name)
    den = _maybe_psum(den, axis_name)
    err = num / jnp.clip(den, 1e-5, None) / 3.0 / d
    return err, env_scaled


def render_error(
    diffuse_pred: jnp.ndarray,
    specular_pred: jnp.ndarray,
    im_small: jnp.ndarray,
    seg_small: jnp.ndarray,
    axis_name: Optional[str] = None,
):
    """Rendering loss vs the (pooled) input image.

    Fits the diffuse/specular pair onto the image with the 2x2 closed-form
    system, clamps the sum to [0,1] and takes the masked MSE
    (wrapperBRDFLight.py:197-207).  Returns (error, rendered_image).
    """
    diffuse_s, specular_s = ls_regress_diff_spec(
        jax.lax.stop_gradient(diffuse_pred),
        jax.lax.stop_gradient(specular_pred),
        im_small,
        diffuse_pred,
        specular_pred,
    )
    rendered = jnp.clip(diffuse_s + specular_s, 0.0, 1.0)
    err = masked_sq_sum(rendered, im_small, seg_small, 3.0, axis_name)
    return err, rendered
