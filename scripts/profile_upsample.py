"""Micro-bench 2x bilinear upsample formulations fwd+bwd on the chip.

Variants: dense-matmul (jax.image.resize), 2-tap shift+interleave,
lhs-dilated depthwise conv with border correction.  Timing runs ITERS
executions inside ONE jitted lax.scan dispatch (per-call dispatch over
the tunnel backend costs ~300 ms and would swamp a ~1 ms op).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

ITERS = 50


def _upsample2x_1d(x, axis):
    """2-tap shift formulation of exact 2x bilinear along one axis (the
    losing variant; kept inline here after its removal from imageops)."""
    n = x.shape[axis]
    lo = jax.lax.slice_in_dim(x, 0, n, axis=axis)
    him = jax.lax.slice_in_dim(x, 1, n, axis=axis)
    hi = jnp.concatenate(
        [him, jax.lax.slice_in_dim(x, n - 1, n, axis=axis)], axis=axis
    )
    lom = jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)
    prev = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis), lom], axis=axis
    )
    even = 0.25 * prev + 0.75 * lo
    odd = 0.75 * lo + 0.25 * hi
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return out.reshape(shape)


def scan_time(make_body, x):
    """ms per op: scan ITERS dependent iterations inside one dispatch."""

    @jax.jit
    def many(x):
        def body(c, _):
            return make_body(x, c), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    np.asarray(many(x))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(many(x))
    return (time.perf_counter() - t0) / ITERS * 1e3


def up_resize(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear")


def up_shift(x):
    return _upsample2x_1d(_upsample2x_1d(x, 1), 2)


def up_dw_conv(x):
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
    # zero padding under-weights the clamped border taps (0.75 vs 1.0)
    fix = jnp.ones((2 * h,), x.dtype).at[0].set(4.0 / 3.0).at[-1].set(4.0 / 3.0)
    fixw = jnp.ones((2 * w,), x.dtype).at[0].set(4.0 / 3.0).at[-1].set(4.0 / 3.0)
    return y * fix[None, :, None, None] * fixw[None, None, :, None]


SHAPES = [
    (16, 120, 160, 128),  # decoder d5->d6 input
    (16, 60, 80, 256),    # d4->d5
    (5, 240, 320, 11),    # light preProcess input
]
DT = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] == "bf16") else jnp.float32

variants = [("resize_mm", up_resize), ("shift2tap", up_shift), ("dwconv", up_dw_conv)]
rng = np.random.RandomState(0)
for shape in SHAPES:
    x = jnp.asarray(rng.randn(*shape), DT)
    ref = None
    print(f"-- {shape} {DT.__name__}")
    for name, up in variants:
        y = np.asarray(jax.jit(up)(x), np.float32)
        if ref is None:
            ref = y
        err = np.abs(y - ref).max()

        def fwd_body(x, c, up=up):
            return c + up(x + c.astype(x.dtype))[0, 0, 0, 0].astype(jnp.float32)

        def bwd_body(x, c, up=up):
            g = jax.grad(lambda t: jnp.sum(up(t)).astype(jnp.float32))(
                x + c.astype(x.dtype)
            )
            return c + g[0, 0, 0, 0].astype(jnp.float32)

        tf = scan_time(fwd_body, x)
        tb = scan_time(bwd_body, x)
        print(f"  {name:<10} fwd {tf:7.2f} ms  bwd {tb:7.2f} ms  maxdiff {err:.2e}",
              flush=True)
