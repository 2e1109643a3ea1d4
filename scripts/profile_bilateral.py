"""Stage-by-stage TPU timings for the bilateral solver at 120x160/mode-0.

Separates grid build / bistochastize / forward solve / fwd+bwd so the
next optimization targets the real bottleneck.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.ops import bilateral as bl

H, W = 120, 160
N = H * W
P = bl.MODE_PARAMS[0]


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


rng = np.random.RandomState(0)
guide = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
target = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
conf = jnp.asarray(rng.rand(1, H, W, 1), jnp.float32)

grid_fn = jax.jit(
    lambda g: jax.vmap(lambda gi: bl._grid_of(gi, P, N))(g)
)
log(f"grid build:        {timeit(grid_fn, guide):7.2f} ms")
grid = grid_fn(guide)

bisto = jax.jit(jax.vmap(bl.bistochastize))
log(f"bistochastize:     {timeit(bisto, grid):7.2f} ms")
nm = bisto(grid)

solve = jax.jit(
    lambda gr, nm_, t, c: jax.vmap(
        lambda gi, ni, mi, ti, ci: bl._solve_image(
            gi, ti.reshape(-1, 3), ci.reshape(-1, 1), P, nm=(ni, mi)
        )[0]
    )(gr, nm_[0], nm_[1], t, c)
)
log(f"pcg solve (fwd):   {timeit(solve, grid, nm, target, conf):7.2f} ms")

fwd = jax.jit(lambda t, c: bl.bilateral_solve(guide, t, c, P, N))
log(f"full forward:      {timeit(fwd, target, conf):7.2f} ms")


def loss(t, c):
    return jnp.sum(bl.bilateral_solve(guide, t, c, P, N))


g = jax.jit(jax.grad(loss, argnums=(0, 1)))
log(f"full fwd+bwd:      {timeit(g, target, conf):7.2f} ms")
