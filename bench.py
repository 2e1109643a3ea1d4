"""Benchmark: fused SG-shading fwd+bwd throughput on one TPU chip.

Prints ONE JSON line:
  value        = Mpixels/s/chip for the fused Pallas forward+backward at the
                 reference lighting operating point (batch 4, 120x160 grid,
                 12 SG lobes, 8x16 envmap, grads into albedo/normal/rough/
                 axis/lambda/weight).
  vs_baseline  = speedup over the best XLA-compiled pure-jnp implementation
                 of the same computation on the same chip (the reference
                 repo publishes no numbers — SURVEY.md §6 — so the baseline
                 is the unfused XLA path, i.e. what a straight port would
                 run).

Correctness gate: fwd outputs and all 6 input grads must match the jnp path
(rtol-style bound on normalized tensors) before timing counts.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core import brdf, sg
from inverserenderingofindoorscene_tpu.ops.sg_render import render_sg

B, H, W, K = 4, 120, 160, 12


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    albedo = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    normal = rng.uniform(-1, 1, (B, H, W, 3))
    normal[..., 2] = np.abs(normal[..., 2]) + 0.3
    normal = jnp.asarray(
        0.97 * normal / np.linalg.norm(normal, axis=-1, keepdims=True),
        jnp.float32,
    )
    rough = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 1)), jnp.float32)
    ax = rng.uniform(-1, 1, (B, H, W, K, 3))
    ax = jnp.asarray(ax / np.linalg.norm(ax, axis=-1, keepdims=True), jnp.float32)
    lamb = jnp.asarray(rng.uniform(0, 20, (B, H, W, K)), jnp.float32)
    wgt = jnp.asarray(rng.uniform(0, 2, (B, H, W, K, 3)), jnp.float32)
    return albedo, normal, rough, ax, lamb, wgt


def fwd_bwd(render_fn):
    def loss(*a):
        d, s = render_fn(*a)
        return jnp.sum(d * 1.3 + s * 0.7)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))


def timeit(fn, args, iters=50):
    """Amortized per-call time with a HARD host-transfer sync.

    jax.block_until_ready can return before execution completes on the
    experimental remote-tunnel TPU backend; fetching one output to host is
    the only reliable fence (and amortizes the tunnel latency over iters).
    """
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    args = make_inputs()

    def jnp_path(a, n, r, x, lm, w):
        return brdf.render_envmap(a, n, r, sg.sg_to_envmap(x, lm, w))

    g_pal = fwd_bwd(render_sg)
    g_jnp = fwd_bwd(jnp_path)

    # correctness gate (TPU vs TPU)
    gp = g_pal(*args)
    gj = g_jnp(*args)
    ok = True
    for name, a, b in zip(
        ["albedo", "normal", "rough", "axis", "lamb", "weight"], gj, gp
    ):
        scale = max(float(jnp.abs(a).max()), 1.0)
        err = float(jnp.abs(a - b).max()) / scale
        if err > 5e-2:
            print(f"GRAD MISMATCH {name}: rel {err}", file=sys.stderr)
            ok = False

    dt_pal = timeit(g_pal, args)
    dt_jnp = timeit(g_jnp, args)
    pix = B * H * W
    mpix_s = pix / dt_pal / 1e6
    speedup = dt_jnp / dt_pal
    print(
        f"pallas {dt_pal*1e3:.3f} ms  jnp {dt_jnp*1e3:.3f} ms  "
        f"allclose={ok}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "sg_shading_fwd_bwd_throughput"
                + ("" if ok else "_GRAD_MISMATCH"),
                "value": round(mpix_s, 2),
                "unit": "Mpixels/s/chip",
                "vs_baseline": round(speedup, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
