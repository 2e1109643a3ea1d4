"""Micro-bench GroupNorm formulations fwd+bwd on the chip.

flax nn.GroupNorm reshapes to [..., G, C/G] to reduce group stats; on TPU
the minor-dim reshape retiles lanes and shows up as relayout copies in the
step trace (copy/transpose = 31% of the light step).  The alternative
keeps x in [B,H,W,C] and maps channel sums to group sums with a tiny
[C, G] one-hot matmul: one fused reduce pass + one normalize pass, no
reshapes.  Timing: ITERS dependent executions inside one jitted scan.
"""
import functools
import sys
import time

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

ITERS = 30
EPS = 1e-5


def scan_time(make_body, *xs):
    @jax.jit
    def many(*xs):
        def body(c, _):
            return make_body(c, *xs), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    np.asarray(many(*xs))
    t0 = time.perf_counter()
    np.asarray(many(*xs))
    return (time.perf_counter() - t0) / ITERS * 1e3


def gn_flax(x, scale, bias, groups):
    mod = nn.GroupNorm(num_groups=groups, epsilon=EPS, dtype=x.dtype)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x)


def gn_matmul(x, scale, bias, groups):
    b, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32)
    # single fused pass: per-channel sum and sumsq over (H, W)
    s1 = jnp.sum(xf, axis=(1, 2))  # [B, C]
    s2 = jnp.sum(xf * xf, axis=(1, 2))  # [B, C]
    onehot = jnp.equal(
        jnp.arange(c)[:, None] // cg, jnp.arange(groups)[None, :]
    ).astype(jnp.float32)  # [C, G]
    n = h * w * cg
    g1 = (s1 @ onehot) / n  # [B, G] group mean
    g2 = (s2 @ onehot) / n  # [B, G] group mean-square
    mean_c = g1 @ onehot.T  # [B, C]
    var_c = g2 @ onehot.T - mean_c * mean_c
    inv = jax.lax.rsqrt(var_c + EPS)
    y = (xf - mean_c[:, None, None, :]) * inv[:, None, None, :]
    return (y * scale + bias).astype(x.dtype)


SHAPES = [  # (shape, groups): light/brdf encoder+decoder hot layers
    ((5, 240, 320, 32), 2),
    ((16, 240, 320, 64), 4),
    ((16, 120, 160, 128), 8),
    ((5, 60, 80, 512), 32),
]
DT = jnp.bfloat16 if (len(sys.argv) > 1 and sys.argv[1] == "bf16") else jnp.float32

rng = np.random.RandomState(0)
for shape, groups in SHAPES:
    c = shape[-1]
    x = jnp.asarray(rng.randn(*shape), DT)
    scale = jnp.asarray(rng.rand(c), jnp.float32)
    bias = jnp.asarray(rng.rand(c), jnp.float32)
    print(f"-- {shape} G={groups} {DT.__name__}")
    ref = None
    for name, gn in (("flax", gn_flax), ("matmul", gn_matmul)):
        fn = functools.partial(gn, groups=groups)
        y = np.asarray(jax.jit(fn)(x, scale, bias), np.float32)
        if ref is None:
            ref = y
        err = np.abs(y - ref).max()

        def fwd_body(c0, x, s, b, fn=fn):
            return c0 + fn(x + c0.astype(x.dtype), s, b)[0, 0, 0, 0].astype(
                jnp.float32
            )

        def bwd_body(c0, x, s, b, fn=fn):
            g = jax.grad(
                lambda t: jnp.sum(fn(t, s, b)).astype(jnp.float32)
            )(x + c0.astype(x.dtype))
            return c0 + g[0, 0, 0, 0].astype(jnp.float32)

        tf = scan_time(fwd_body, x, scale, bias)
        tb = scan_time(bwd_body, x, scale, bias)
        print(
            f"  {name:<7} fwd {tf:6.2f} ms  bwd {tb:6.2f} ms  maxdiff {err:.2e}",
            flush=True,
        )
