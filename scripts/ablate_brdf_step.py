"""Ablate the BRDF train step: fwd / fwd+loss / grad / full, +remat."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from inverserenderingofindoorscene_tpu.data.synthetic import synthetic_batch
from inverserenderingofindoorscene_tpu.pipeline.brdf import (
    BRDFNets,
    brdf_forward,
    brdf_step,
    brdf_total_error,
)
from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    make_brdf_train_step,
    reference_adam,
)


def fence(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def timeit(fn, *args, iters=10):
    fence(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters * 1e3


DT = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
nets = BRDFNets(cascade_level=0, compute_dtype=DT)
params = nets.init(jax.random.PRNGKey(0), (240, 320))
batch = synthetic_batch(batch=16, im_hw=(240, 320), env_rc=(120, 160))

fwd = jax.jit(lambda p, b: brdf_forward(nets, p, b))
print(f"fwd only:        {timeit(fwd, params, batch):7.1f} ms")

loss_only = jax.jit(
    lambda p, b: brdf_total_error(brdf_step(nets, p, b)[1])
)
print(f"fwd+loss:        {timeit(loss_only, params, batch):7.1f} ms")

grad = jax.jit(jax.grad(
    lambda p, b: brdf_total_error(brdf_step(nets, p, b)[1])
))
print(f"grad:            {timeit(grad, params, batch):7.1f} ms")


def loss_remat(p, b):
    f = jax.checkpoint(lambda pp: brdf_forward(nets, pp, b))
    preds = f(p)
    from inverserenderingofindoorscene_tpu.losses.masked import brdf_errors

    errors, _ = brdf_errors(
        preds["albedo"], preds["normal"], preds["rough"], preds["depth"], b
    )
    return brdf_total_error(errors)


grad_r = jax.jit(jax.grad(loss_remat))
print(f"grad (remat):    {timeit(grad_r, params, batch):7.1f} ms")

step = jax.jit(make_brdf_train_step(nets), donate_argnums=(0,))
state = create_train_state(params, reference_adam(1e-4))
state, m = step(state, batch)
fence(m)
t0 = time.perf_counter()
cur = state
for _ in range(10):
    cur, m = step(cur, batch)
fence(m)
print(f"full step:       {(time.perf_counter()-t0)/10*1e3:7.1f} ms")
