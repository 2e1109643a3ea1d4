"""Micro-bench: blur/gather formulations for the bilateral grid on TPU."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

V = 19200
rng = np.random.RandomState(0)
nbr = jnp.asarray(rng.randint(-1, V, (10, V)), jnp.int32)
y1 = jnp.asarray(rng.rand(V, 1), jnp.float32)
y3 = jnp.asarray(rng.rand(V, 3), jnp.float32)


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def blur_loop(y):
    out = 10.0 * y
    for i in range(10):
        idx = nbr[i]
        out = out + jnp.where((idx >= 0)[:, None], y[jnp.maximum(idx, 0)], 0.0)
    return out


def blur_fused(y):
    idx = nbr.reshape(-1)
    g = jnp.where(
        (idx >= 0)[:, None], y[jnp.maximum(idx, 0)], 0.0
    ).reshape(10, V, -1)
    return 10.0 * y + jnp.sum(g, axis=0)


def blur_onehotless_take(y):
    idx = nbr.reshape(-1)
    g = jnp.take(y, jnp.maximum(idx, 0), axis=0, mode="clip")
    g = jnp.where((idx >= 0)[:, None], g, 0.0).reshape(10, V, -1)
    return 10.0 * y + jnp.sum(g, axis=0)


for name, fn in [("loop", blur_loop), ("fused", blur_fused),
                 ("take", blur_onehotless_take)]:
    j1 = jax.jit(fn)
    log(f"{name} [V,1]: {timeit(j1, y1):6.2f} ms   [V,3]: {timeit(j1, y3):6.2f} ms")

# vmapped (B=1) as used in the solver
for name, fn in [("loop", blur_loop), ("fused", blur_fused)]:
    j1 = jax.jit(jax.vmap(fn))
    log(f"vmap {name} [1,V,3]: {timeit(j1, y3[None]):6.2f} ms")

# 11 chained blurs (the bistochastize pattern)
def bisto_like(y):
    def body(_, n):
        return jnp.sqrt(jnp.abs(blur_fused(n)) + 1e-6)
    return jax.lax.fori_loop(0, 10, body, y)

log(f"10 chained fused blurs [V,1]: {timeit(jax.jit(bisto_like), y1):6.2f} ms")

# smaller V
for vs in (4096, 8192):
    nbr_s = jnp.asarray(rng.randint(-1, vs, (10, vs)), jnp.int32)
    ys = jnp.asarray(rng.rand(vs, 3), jnp.float32)

    def blur_s(y, nbr_s=nbr_s, vs=vs):
        idx = nbr_s.reshape(-1)
        g = jnp.where(
            (idx >= 0)[:, None], y[jnp.maximum(idx, 0)], 0.0
        ).reshape(10, vs, -1)
        return 10.0 * y + jnp.sum(g, axis=0)

    log(f"fused V={vs} [V,3]: {timeit(jax.jit(blur_s), ys):6.2f} ms")
