"""Image-space ops with exact reference semantics (NHWC).

Bilinear resize here matches ``F.interpolate(..., mode='bilinear',
align_corners=False)`` (half-pixel centers); adaptive average pooling
matches ``F.adaptive_avg_pool2d``.  Replication padding matches
``nn.ReplicationPad2d``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _edge_fold_1d(g: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Transpose of a 1-px edge-replicate pad along ``axis``: inner rows
    pass through, the first/last inner rows absorb the pad rows."""
    n = g.shape[axis]

    def sl(s, e):
        return jax.lax.slice_in_dim(g, s, e, axis=axis)

    first = sl(0, 1) + sl(1, 2)
    last = sl(n - 2, n - 1) + sl(n - 1, n)
    return jnp.concatenate([first, sl(2, n - 2), last], axis=axis)


@jax.custom_vjp
def _replication_pad1(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")


def _replication_pad1_fwd(x):
    return _replication_pad1(x), None


def _replication_pad1_bwd(_, g):
    return (_edge_fold_1d(_edge_fold_1d(g, 1), 2),)


_replication_pad1.defvjp(_replication_pad1_fwd, _replication_pad1_bwd)


def replication_pad(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    """Edge-replicate pad the two spatial dims of an NHWC tensor.

    pad=1 (every call site in the models) carries a hand-written VJP:
    XLA's auto-derived edge-pad transpose emits a slice/select/pad chain
    that measures 25x above memory-bound on the 240x320 decoder tensors
    (fusion.85 in the BRDF-step profile, 5.5 ms); two slice+concat edge
    folds do the same math in 0.23 ms (scripts/profile_padgrad.py:
    fwd+bwd 1.82 -> 0.79 ms per pad at 16x240x320x64 bf16).
    """
    if pad == 1:
        return _replication_pad1(x)
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def _upsample2x_dwconv(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear upsample (half-pixel centers) as a dilated
    depthwise conv.

    ``jax.image.resize('linear')`` at a factor-2 scale builds DENSE
    [2n, n] per-axis weight matrices (2 nonzeros per row) and matmuls
    them on the MXU.  The same map is a 4-tap [0.25 0.75 0.75 0.25]
    separable kernel applied with lhs_dilation=2; zero padding
    under-weights the clamped border taps (0.75 instead of 1.0), fixed
    by an exact 4/3 rescale of the first/last row and column.  Measured
    (scripts/profile_upsample.py, v5e bf16, 16x120x160x128):
    fwd 1.74->1.05 ms, bwd 1.28->0.69 ms vs the dense-matmul resize.
    """
    b, h, w, c = x.shape
    k1 = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    k = jnp.tile(jnp.outer(k1, k1)[:, :, None, None], (1, 1, 1, c))
    y = jax.lax.conv_general_dilated(
        x, k,
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    # the 4/3 correction runs in f32 even for bf16 inputs: bf16(4/3) is
    # 1.3359, a one-sided ~0.2% bias on every border pixel; the f32
    # multiply fuses into the conv epilogue and rounds once at the end
    fixh = jnp.ones((2 * h,), jnp.float32).at[0].set(4.0 / 3.0)
    fixh = fixh.at[-1].set(4.0 / 3.0)
    fixw = jnp.ones((2 * w,), jnp.float32).at[0].set(4.0 / 3.0)
    fixw = fixw.at[-1].set(4.0 / 3.0)
    out = y.astype(jnp.float32)
    out = out * fixh[None, :, None, None] * fixw[None, None, :, None]
    return out.astype(x.dtype)


def resize_bilinear(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize of NHWC to (H', W') with half-pixel centers.

    Equivalent to torch ``F.interpolate(mode='bilinear',
    align_corners=False)``: jax.image.resize('linear') uses the same
    half-pixel sampling convention.  Exact factor-2 upscales of LARGE
    wide tensors take the depthwise-conv fast path (same numbers up to
    accumulation order).  The >=8M-element, >=32-channel gate is
    measured (scripts/ab_upsample_steps.py): the dwconv wins on the
    BRDF decoder tail (B16 at 240x320: step 113.6->101.1 ms) but loses
    to the matmul on the light decoders' small B5 tensors (70.9->73.3).
    """
    b, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if _use_dwconv_upsample(b, h, w, c, oh, ow):
        return _upsample2x_dwconv(x)
    return jax.image.resize(x, (b, oh, ow, c), method="linear")


def _use_dwconv_upsample(b, h, w, c, oh, ow) -> bool:
    """The measured routing gate of :func:`resize_bilinear` (see its
    docstring): exact 2x upscale, >=32 channels, >=8M elements."""
    return oh == 2 * h and ow == 2 * w and c >= 32 and b * h * w * c >= 8_000_000


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
