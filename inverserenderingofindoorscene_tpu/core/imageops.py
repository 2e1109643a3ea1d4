"""Image-space ops with exact reference semantics (NHWC).

Bilinear resize here matches ``F.interpolate(..., mode='bilinear',
align_corners=False)`` (half-pixel centers); adaptive average pooling
matches ``F.adaptive_avg_pool2d``.  Replication padding matches
``nn.ReplicationPad2d``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def replication_pad(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    """Edge-replicate pad the two spatial dims of an NHWC tensor."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def resize_bilinear(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize of NHWC to (H', W') with half-pixel centers.

    Equivalent to torch ``F.interpolate(mode='bilinear',
    align_corners=False)``: jax.image.resize('linear') uses the same
    half-pixel sampling convention.
    """
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="linear")


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))


def adaptive_avg_pool(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch ``F.adaptive_avg_pool2d`` on NHWC.

    Fast path for integer downsample ratios (reshape + mean, exact);
    general path uses the torch bin rule start=floor(i*H/out),
    end=ceil((i+1)*H/out) via a normalized matmul (exact, still jit-able
    since shapes are static).
    """
    oh, ow = int(out_hw[0]), int(out_hw[1])
    b, h, w, c = x.shape
    if h == oh and w == ow:
        return x
    if h % oh == 0 and w % ow == 0:
        fh, fw = h // oh, w // ow
        return x.reshape(b, oh, fh, ow, fw, c).mean(axis=(2, 4))
    return _adaptive_pool_general(x, oh, ow)


def _pool_matrix(n_in: int, n_out: int, dtype) -> jnp.ndarray:
    import numpy as np

    m = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        s = (i * n_in) // n_out
        e = -((-(i + 1) * n_in) // n_out)  # ceil
        m[i, s:e] = 1.0 / (e - s)
    return jnp.asarray(m, dtype=dtype)


def _adaptive_pool_general(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    mh = _pool_matrix(h, oh, x.dtype)
    mw = _pool_matrix(w, ow, x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, x)
