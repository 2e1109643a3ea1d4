"""Closed-form scale-invariance solvers.

Albedo, depth and lighting are only recoverable up to a global scale from a
single image, so every loss first fits a per-image scalar (or a diffuse /
specular pair) onto the ground truth in closed form.  Gradients must NOT
flow through the fitted coefficients — every ``.detach()`` of the reference
(/root/reference/models.py:7-84) maps to a ``lax.stop_gradient`` here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ls_regress(pred: jnp.ndarray, gt: jnp.ndarray, origin: jnp.ndarray) -> jnp.ndarray:
    """One-parameter least-squares rescale of ``origin`` onto ``gt``.

    coef = <pred, gt> / max(<pred, pred>, 1e-5) per batch element, detached
    and clamped to [1e-3, 1e3]; returns origin * coef.  Matches the reference
    ``LSregress`` (models.py:7-21). ``pred``/``gt``/``origin`` are
    [B, ...] with identical shapes.
    """
    b = pred.shape[0]
    p = pred.reshape(b, -1)
    g = gt.reshape(b, -1)
    coef = jnp.sum(p * g, axis=1) / jnp.clip(jnp.sum(p * p, axis=1), 1e-5, None)
    coef = jax.lax.stop_gradient(coef)
    coef = jnp.clip(coef, 0.001, 1000.0)
    coef = coef.reshape((b,) + (1,) * (pred.ndim - 1))
    return origin * coef


def ls_regress_diff_spec(
    diff: jnp.ndarray,
    spec: jnp.ndarray,
    im_orig: jnp.ndarray,
    diff_orig: jnp.ndarray,
    spec_orig: jnp.ndarray,
):
    """Jointly scale diffuse+specular onto the image (2x2 LS system).

    Matches the reference ``LSregressDiffSpec`` (models.py:23-84):
      * bright pixels (im >= 0.9) are masked out of the fit;
      * solve [a11 a12; a12 a22][c1;c2] = [b1;b2];
      * if the system is near-singular (det/(C*H*W) <= 1e-2), fall back to
        diffuse-only fit c3 = b1/a11 (clamped), c4 = 0;
      * a second 1-parameter pass fits clamp(c1*d + c2*s, 0, 1) onto the
        unmasked image (coefficient detached).

    Callers pass stop_gradient'ed diff/spec for the fit and the original
    (differentiable) tensors as diff_orig/spec_orig, mirroring every call
    site in the reference wrappers.

    Shapes: all [B, H, W, C] (NHWC). Returns (diff_scaled, spec_scaled).
    """
    b = diff.shape[0]
    numel = diff[0].size  # C*H*W per image

    mask = (im_orig < 0.9).astype(diff.dtype)
    d = (diff * mask).reshape(b, -1)
    s = (spec * mask).reshape(b, -1)
    im = (im_orig * mask).reshape(b, -1)

    a11 = jnp.sum(d * d, axis=1)
    a22 = jnp.sum(s * s, axis=1)
    a12 = jnp.sum(d * s, axis=1)

    frac = a11 * a22 - a12 * a12
    b1 = jnp.sum(d * im, axis=1)
    b2 = jnp.sum(s * im, axis=1)

    coef1 = (b1 * a22 - b2 * a12) / jnp.clip(frac, 1e-2, None)
    coef2 = (-b1 * a12 + a11 * b2) / jnp.clip(frac, 1e-2, None)

    coef3 = jnp.clip(b1 / jnp.clip(a11, 1e-5, None), 0.001, 1000.0)
    coef4 = jnp.zeros_like(coef3)

    frac_ind = (jax.lax.stop_gradient(frac / numel) > 1e-2).astype(diff.dtype)
    coef_d = frac_ind * coef1 + (1.0 - frac_ind) * coef3
    coef_s = frac_ind * coef2 + (1.0 - frac_ind) * coef4

    coef_d = jnp.clip(coef_d, 0.0, 1000.0).reshape(b, 1, 1, 1)
    coef_s = jnp.clip(coef_s, 0.0, 1000.0).reshape(b, 1, 1, 1)

    diff_scaled = coef_d * diff_orig
    spec_scaled = coef_s * spec_orig

    rendered = jnp.clip(diff_scaled + spec_scaled, 0.0, 1.0).reshape(b, -1)
    im_flat = im_orig.reshape(b, -1)
    coef_im = jnp.sum(rendered * im_flat, axis=1) / jnp.clip(
        jnp.sum(rendered * rendered, axis=1), 1e-5, None
    )
    coef_im = jax.lax.stop_gradient(coef_im)
    coef_im = jnp.clip(coef_im, 0.001, 1000.0).reshape(b, 1, 1, 1)

    return coef_im * diff_scaled, coef_im * spec_scaled
