"""Micro-bench the replication_pad VJP: XLA-derived vs hand-written."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

ITERS = 50


def scan_time(make_body, x):
    @jax.jit
    def many(x):
        def body(c, _):
            return make_body(x, c), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    np.asarray(many(x))
    t0 = time.perf_counter()
    np.asarray(many(x))
    return (time.perf_counter() - t0) / ITERS * 1e3


def pad_xla(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")


def _edge_fold_1d(g, axis):
    """Transpose of 1-px edge-replicate pad along `axis`:
    inner rows pass through; first/last inner rows absorb the pad rows."""
    n = g.shape[axis]
    sl = lambda s, e: jax.lax.slice_in_dim(g, s, e, axis=axis)
    first = sl(0, 1) + sl(1, 2)
    last = sl(n - 2, n - 1) + sl(n - 1, n)
    return jnp.concatenate([first, sl(2, n - 2), last], axis=axis)


@jax.custom_vjp
def pad_custom(x):
    return pad_xla(x)


def _fwd(x):
    return pad_xla(x), None


def _bwd(_, g):
    return (_edge_fold_1d(_edge_fold_1d(g, 1), 2),)


pad_custom.defvjp(_fwd, _bwd)

SHAPE = (16, 240, 320, 64)
DT = jnp.bfloat16
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(*SHAPE), DT)
r = jnp.asarray(rng.randn(SHAPE[0], SHAPE[1] + 2, SHAPE[2] + 2, SHAPE[3]), DT)

# correctness: VJPs agree
g1 = jax.jit(jax.grad(lambda t: jnp.sum((pad_xla(t) * r).astype(jnp.float32))))(x)
g2 = jax.jit(jax.grad(lambda t: jnp.sum((pad_custom(t) * r).astype(jnp.float32))))(x)
print("vjp maxdiff:", float(jnp.max(jnp.abs(g1.astype(jnp.float32) - g2.astype(jnp.float32)))))

for name, pad in [("xla", pad_xla), ("custom", pad_custom)]:
    def fwd_body(x, c, pad=pad):
        return c + pad(x + c.astype(x.dtype))[0, 0, 0, 0].astype(jnp.float32)

    def bwd_body(x, c, pad=pad):
        g = jax.grad(
            lambda t: jnp.sum((pad(t) * r).astype(jnp.float32))
        )(x + c.astype(x.dtype))
        return c + g[0, 0, 0, 0].astype(jnp.float32)

    tf = scan_time(fwd_body, x)
    tb = scan_time(bwd_body, x)
    print(f"{name:<7} fwd {tf:6.2f} ms  fwd+bwd {tb:6.2f} ms", flush=True)
