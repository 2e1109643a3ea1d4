"""A/B: decoder-tail convs at 64 channels vs zero-padded to 128 (VERDICT r2 #8).

The BRDF step is MXU-capped at ~27.5% with the four U-Net decoders' 64-
channel 240x320 tail convs as the hot layers — 64 output channels is half
an MXU tile.  Padding the tail to 128 channels with zero weights is
numerically identity (zero out-channels stay zero through GroupNorm with
pad-only groups, ReLU, and zero-weight consumers) but doubles the nominal
FLOPs.  This measures whether the 128-wide convs run at BETTER THAN 2x
the 64-wide time (i.e. whether the tile is currently half-wasted) — if
not, the 64-ch tail is already tile-efficient and the cap is real.

Shapes: the two hottest tail instances (dconv5 @ 120x160 in128->out64 and
dconv6 @ 240x320 in64->out64, models/mgnet.py decoder; reference
models.py:159-187), B16 bf16 like the measured operating point.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(m):
    print(m, flush=True)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    cases = [
        # (tag, B, H, W, Cin, Cout)
        ("dconv5 120x160", 16, 120, 160, 128, 64),
        ("dconv5 pad-out", 16, 120, 160, 128, 128),
        ("dconv6 240x320", 16, 240, 320, 64, 64),
        ("dconv6 pad-out", 16, 240, 320, 64, 128),
        ("dconv6 pad-both", 16, 240, 320, 128, 128),
    ]
    for tag, b, h, w, ci, co in cases:
        x = jnp.asarray(rng.rand(b, h, w, ci), dtype)
        k = jnp.asarray(rng.rand(3, 3, ci, co) * 0.1, dtype)
        f = jax.jit(conv)
        ms = timeit(f, x, k)
        flops = 2 * b * h * w * ci * co * 9
        log(f"{tag:16s} [{b},{h},{w},{ci}]->{co}: {ms:7.2f} ms  "
            f"{flops / ms / 1e9:7.1f} GFLOP/s")


if __name__ == "__main__":
    main()
