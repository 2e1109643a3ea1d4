"""A/B the fused (vmapped/grouped-conv) vs sequential 4-decoder BRDF step."""
import dataclasses
import sys
import time

import numpy as np

import jax

sys.path.insert(0, "/root/repo")
from inverserenderingofindoorscene_tpu.data.synthetic import synthetic_batch
from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    make_brdf_train_step,
    reference_adam,
)


def fence(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0])


DT = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
batch = synthetic_batch(batch=16, im_hw=(240, 320), env_rc=(120, 160))

for fuse in (False, True):
    nets = BRDFNets(cascade_level=0, compute_dtype=DT, fuse_decoders=fuse)
    params = nets.init(jax.random.PRNGKey(0), (240, 320))
    step = jax.jit(make_brdf_train_step(nets), donate_argnums=(0,))
    state = create_train_state(params, reference_adam(1e-4))
    state, m = step(state, batch)
    fence(m)
    t0 = time.perf_counter()
    cur = state
    for _ in range(10):
        cur, m = step(cur, batch)
    fence(m)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"fuse_decoders={fuse} {DT}: {ms:7.1f} ms/step "
          f"(loss {float(m['total']):.5f})", flush=True)
