"""Phase-by-phase timing probe for the axon tunnel backend.

Separates: backend init / trace+lower / compile / first exec / steady exec
for the fused SG kernel fwd+bwd, with the persistent cache DISABLED so the
numbers are true-cold. Run under `timeout`.
"""
import os
import sys
import time

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log(f"jax imported; devices: {jax.devices()}")

from inverserenderingofindoorscene_tpu.ops.sg_render import render_sg  # noqa: E402

B, H, W, K = 4, 120, 160, 12
rng = np.random.RandomState(0)
albedo = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
normal = rng.uniform(-1, 1, (B, H, W, 3))
normal[..., 2] = np.abs(normal[..., 2]) + 0.3
normal = jnp.asarray(normal / np.linalg.norm(normal, axis=-1, keepdims=True), jnp.float32)
rough = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 1)), jnp.float32)
ax = rng.uniform(-1, 1, (B, H, W, K, 3))
ax = jnp.asarray(ax / np.linalg.norm(ax, axis=-1, keepdims=True), jnp.float32)
lamb = jnp.asarray(rng.uniform(0, 20, (B, H, W, K)), jnp.float32)
wgt = jnp.asarray(rng.uniform(0, 2, (B, H, W, K, 3)), jnp.float32)
args = (albedo, normal, rough, ax, lamb, wgt)
np.asarray(albedo)
log("inputs on device")


def loss(*a):
    d, s = render_sg(*a)
    return jnp.sum(d * 1.3 + s * 0.7)


g = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))

t = time.time()
lowered = jax.jit(g).lower(*args)
log(f"lowered in {time.time() - t:.1f}s; HLO bytes: {len(lowered.as_text())}")

t = time.time()
compiled = lowered.compile()
log(f"compiled in {time.time() - t:.1f}s")

t = time.time()
out = compiled(*args)
np.asarray(jax.tree_util.tree_leaves(out)[0])
log(f"first exec+fetch in {time.time() - t:.1f}s")

for i in range(3):
    t = time.time()
    out = compiled(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    log(f"exec {i} in {(time.time() - t)*1e3:.1f}ms")

t = time.time()
outs = [compiled(*args) for _ in range(20)]
np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
log(f"20 pipelined execs: {(time.time() - t)*1e3/20:.2f}ms/call")
