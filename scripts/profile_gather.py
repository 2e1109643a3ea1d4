"""Find the per-gather cost floor on the TPU tunnel backend."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=50):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


rng = np.random.RandomState(0)
for V in (4096, 19200):
    idx = jnp.asarray(rng.randint(0, V, (V,)), jnp.int32)
    y2 = jnp.asarray(rng.rand(V, 3), jnp.float32)
    y1 = jnp.asarray(rng.rand(V), jnp.float32)

    g2 = jax.jit(lambda y, i: y[i])
    g1 = jax.jit(lambda y, i: y[i])
    log(f"V={V}: one 2D-row gather {timeit(g2, y2, idx):6.3f} ms | "
        f"one 1D gather {timeit(g1, y1, idx):6.3f} ms")

    gn = jax.jit(lambda y, i: sum(y[(i + k) % V] for k in range(10)))
    log(f"V={V}: ten dependent-free 1D gathers {timeit(gn, y1, idx):6.3f} ms")

    # an entire no-gather baseline of same arithmetic size
    ar = jax.jit(lambda y: sum(jnp.roll(y, k) for k in range(10)))
    log(f"V={V}: ten rolls (no gather)        {timeit(ar, y1):6.3f} ms")

    # scatter-add cost (the splat direction)
    sc = jax.jit(
        lambda y, i: jnp.zeros((V,), jnp.float32).at[i].add(y)
    )
    log(f"V={V}: one 1D scatter-add           {timeit(sc, y1, idx):6.3f} ms")

# argsort-permutation gather (monotone-ish?) vs random
V = 19200
perm = jnp.asarray(rng.permutation(V), jnp.int32)
y1 = jnp.asarray(rng.rand(V), jnp.float32)
g1 = jax.jit(lambda y, i: y[i])
log(f"perm gather {timeit(g1, y1, perm):6.3f} ms | "
    f"sorted-idx gather {timeit(g1, y1, jnp.sort(perm)):6.3f} ms")
