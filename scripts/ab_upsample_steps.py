"""A/B the dwconv-vs-matmul 2x upsample inside the full train steps."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import inverserenderingofindoorscene_tpu.core.imageops as io


def fence(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def time_step(stage, dtype):
    from scripts.profile_steps import build_step

    step, state, batch = build_step(stage, dtype)
    state, m = step(state, batch)
    fence(m)
    t0 = time.perf_counter()
    cur = state
    for _ in range(10):
        cur, m = step(cur, batch)
    fence(m)
    return (time.perf_counter() - t0) / 10 * 1e3


orig = io._upsample2x_dwconv
stages = sys.argv[1:] or ["brdf", "light"]
for stage in stages:
    for use_dw in (False, True):
        if use_dw:
            io._upsample2x_dwconv = orig
        else:
            io._upsample2x_dwconv = lambda x: jax.image.resize(
                x, (x.shape[0], 2 * x.shape[1], 2 * x.shape[2], x.shape[3]),
                method="linear")
        ms = time_step(stage, "bfloat16")
        print(f"{stage} dwconv={use_dw}: {ms:7.1f} ms/step", flush=True)
