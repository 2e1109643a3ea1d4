"""Distributed correctness: the same step on 1 chip vs an 8-device mesh.

The SURVEY §4 distributed-test recipe: run the identical train step on one
device and sharded over the virtual 8-device CPU mesh; the global masked
losses and updated params must match (the loss normalization uses global
pixel counts, so any sharding bug shows up as a numeric drift).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.data.synthetic import synthetic_batch
from inverserenderingofindoorscene_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    shard_batch,
)
from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
from inverserenderingofindoorscene_tpu.pipeline.light import LightNets
from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    make_brdf_train_step,
    make_light_train_step,
    reference_adam,
)

IM_HW = (64, 64)
ENV_RC = (32, 32)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_brdf_step_matches_across_mesh():
    nets = BRDFNets(cascade_level=0)
    params = nets.init(jax.random.PRNGKey(0), IM_HW)
    batch = synthetic_batch(batch=8, im_hw=IM_HW, env_rc=ENV_RC, seed=0)
    step = make_brdf_train_step(nets)

    # single device
    state1 = create_train_state(params, reference_adam(1e-4))
    state1, m1 = jax.jit(step)(state1, batch)

    # 8-device {data, tile} mesh
    mesh = make_mesh(jax.devices()[:8], tile=2)
    with jax.set_mesh(mesh):
        state8 = create_train_state(params, reference_adam(1e-4))
        state8 = jax.device_put(state8, replicated(mesh))
        sbatch = shard_batch(batch, mesh)
        state8, m8 = jax.jit(step)(state8, sbatch)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=2e-4, err_msg=k
        )
    # updated params match too (gradient all-reduce correctness)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state1.params,
        jax.device_get(state8.params),
    )
    # Adam normalizes by sqrt(v): for near-zero grads a different f32
    # reduction order can flip the update sign, so per-param drift is
    # bounded by ~2*lr (2e-4), not by grad accuracy.
    max_diff = max(jax.tree_util.tree_leaves(diff))
    assert max_diff < 3e-4, max_diff


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_light_step_matches_across_mesh():
    brdf_nets = BRDFNets(cascade_level=0)
    light_nets = LightNets(
        cascade_level=0, env_rows=ENV_RC[0], env_cols=ENV_RC[1]
    )
    bp = brdf_nets.init(jax.random.PRNGKey(0), IM_HW)
    lp = light_nets.init(jax.random.PRNGKey(1))
    batch = synthetic_batch(batch=4, im_hw=IM_HW, env_rc=ENV_RC, seed=1)
    step = make_light_train_step(brdf_nets, light_nets, bp)

    state1 = create_train_state(lp, reference_adam(1e-4))
    state1, m1 = jax.jit(step)(state1, batch)

    mesh = make_mesh(jax.devices()[:8], tile=2)
    with jax.set_mesh(mesh):
        state8 = create_train_state(lp, reference_adam(1e-4))
        state8 = jax.device_put(state8, replicated(mesh))
        sbatch = shard_batch(batch, mesh)
        state8, m8 = jax.jit(step)(state8, sbatch)

    for k in ("reconst", "render", "total"):
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=5e-4, err_msg=k
        )
