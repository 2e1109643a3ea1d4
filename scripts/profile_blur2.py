"""Variants for the bistochastize-shaped blur chain ([V]-vector, 11 deps)."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

V = 19200
rng = np.random.RandomState(0)
nbr8 = jnp.asarray(rng.randint(-1, V, (8, V)), jnp.int32)
mask_vm = jnp.asarray(rng.rand(V) > 0.3, jnp.float32)
mask_vp = jnp.asarray(rng.rand(V) > 0.3, jnp.float32)
y0 = jnp.asarray(rng.rand(V, 1), jnp.float32)


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


def blur_col(y):  # current: [V,1] with where-masked gathers + rolls
    out = 10.0 * y
    for i in range(8):
        idx = nbr8[i]
        out = out + jnp.where((idx >= 0)[:, None], y[jnp.maximum(idx, 0)], 0.0)
    out = out + mask_vm[:, None] * jnp.roll(y, 1, axis=0)
    out = out + mask_vp[:, None] * jnp.roll(y, -1, axis=0)
    return out


def chain_col(y):
    def body(_, n):
        return jnp.sqrt(jnp.abs(blur_col(n)) + 1e-6)
    return jax.lax.fori_loop(0, 10, body, y)


def blur_flat(y):  # [V] flat
    out = 10.0 * y
    for i in range(8):
        idx = nbr8[i]
        out = out + jnp.where(idx >= 0, y[jnp.maximum(idx, 0)], 0.0)
    out = out + mask_vm * jnp.roll(y, 1)
    out = out + mask_vp * jnp.roll(y, -1)
    return out


def chain_flat(y):
    def body(_, n):
        return jnp.sqrt(jnp.abs(blur_flat(n)) + 1e-6)
    return jax.lax.fori_loop(0, 10, body, y[:, 0])[:, None]


def blur_pad(y):  # [V] with a zero pad row, no value masking
    yp = jnp.concatenate([y, jnp.zeros((1,), y.dtype)])
    out = 10.0 * y
    for i in range(8):
        idx = nbr8[i]
        out = out + yp[jnp.where(idx < 0, V, idx)]
    out = out + mask_vm * jnp.roll(y, 1)
    out = out + mask_vp * jnp.roll(y, -1)
    return out


def chain_pad(y):
    def body(_, n):
        return jnp.sqrt(jnp.abs(blur_pad(n)) + 1e-6)
    return jax.lax.fori_loop(0, 10, body, y[:, 0])[:, None]


def blur_fused_flat(y):  # one [8V] gather
    idx = nbr8.reshape(-1)
    g = jnp.where(idx >= 0, y[jnp.maximum(idx, 0)], 0.0).reshape(8, V)
    out = 10.0 * y + jnp.sum(g, axis=0)
    out = out + mask_vm * jnp.roll(y, 1)
    out = out + mask_vp * jnp.roll(y, -1)
    return out


def chain_fused(y):
    def body(_, n):
        return jnp.sqrt(jnp.abs(blur_fused_flat(n)) + 1e-6)
    return jax.lax.fori_loop(0, 10, body, y[:, 0])[:, None]


for name, fn in [("col [V,1]", chain_col), ("flat [V]", chain_flat),
                 ("pad-row", chain_pad), ("fused-flat", chain_fused)]:
    log(f"10-chain {name}: {timeit(jax.jit(fn), y0):6.2f} ms")
