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

# Excluded from the fast pre-commit gate (pytest -m 'not slow'); see
# [tool.pytest.ini_options] in pyproject.toml.
pytestmark = pytest.mark.slow

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
def test_bilateral_step_matches_across_mesh():
    """The solver's sort/segment_sum/gather grid build is the most
    sharding-fragile pattern in the system; per-image vmap must split
    cleanly over the batch axis."""
    from inverserenderingofindoorscene_tpu.pipeline.bilateral import (
        BilateralNets,
    )
    from inverserenderingofindoorscene_tpu.train.steps import (
        make_bilateral_train_step,
    )

    im_hw = (32, 32)
    brdf_nets = BRDFNets(cascade_level=0)
    bs_nets = BilateralNets()
    bp = brdf_nets.init(jax.random.PRNGKey(0), im_hw)
    sp = bs_nets.init(jax.random.PRNGKey(1), im_hw)
    batch = synthetic_batch(batch=8, im_hw=im_hw, env_rc=(16, 16), seed=2)
    step = make_bilateral_train_step(brdf_nets, bs_nets, bp)

    state1 = create_train_state(sp, reference_adam(1e-4))
    state1, m1 = jax.jit(step)(state1, batch)

    mesh = make_mesh(jax.devices()[:8], tile=2)
    with jax.set_mesh(mesh):
        state8 = create_train_state(sp, reference_adam(1e-4))
        state8 = jax.device_put(state8, replicated(mesh))
        sbatch = shard_batch(batch, mesh)
        state8, m8 = jax.jit(step)(state8, sbatch)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=5e-4, err_msg=k
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_nyu_finetune_step_matches_across_mesh():
    from inverserenderingofindoorscene_tpu.train.steps import (
        make_nyu_train_step,
    )

    rng = np.random.RandomState(5)
    b, (h, w) = 8, IM_HW
    nets = BRDFNets(cascade_level=0)
    params = nets.init(jax.random.PRNGKey(5), IM_HW)
    normal = rng.uniform(-1, 1, (b, h, w, 3))
    normal[..., 2] = np.abs(normal[..., 2]) + 0.3
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    batch = {
        "im": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "normal": jnp.asarray(normal, jnp.float32),
        "depth": jnp.asarray(rng.uniform(0.1, 5, (b, h, w, 1)), jnp.float32),
        "seg_normal": jnp.asarray(rng.rand(b, h, w, 1) > 0.2, jnp.float32),
        "seg_depth": jnp.asarray(rng.rand(b, h, w, 1) > 0.2, jnp.float32),
    }
    step = make_nyu_train_step(nets)

    state1 = create_train_state(params, reference_adam(1e-4))
    state1, m1 = jax.jit(step)(state1, batch)

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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_cascade1_light_step_matches_across_mesh():
    """Cascade 1: env_pre is tile-sharded (mesh._TILE_DIMS) and the BRDF
    encoder runs the 17-channel cascade input path."""
    brdf_nets = BRDFNets(cascade_level=1)
    light_nets = LightNets(
        cascade_level=1, env_rows=ENV_RC[0], env_cols=ENV_RC[1]
    )
    bp = brdf_nets.init(jax.random.PRNGKey(7), IM_HW)
    lp = light_nets.init(jax.random.PRNGKey(8))
    batch = synthetic_batch(
        batch=4, im_hw=IM_HW, env_rc=ENV_RC, cascade_level=1, seed=7
    )
    step = make_light_train_step(brdf_nets, light_nets, bp)

    state1 = create_train_state(lp, reference_adam(1e-4))
    state1, m1 = jax.jit(step)(state1, batch)

    mesh = make_mesh(jax.devices()[:8], tile=2)
    with jax.set_mesh(mesh):
        state8 = create_train_state(lp, reference_adam(1e-4))
        state8 = jax.device_put(state8, replicated(mesh))
        sbatch = shard_batch(batch, mesh)
        # env_pre really is split over the tile axis
        spec = sbatch["env_pre"].sharding.spec
        assert "tile" in str(spec), spec
        state8, m8 = jax.jit(step)(state8, sbatch)

    for k in ("reconst", "render", "total"):
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=5e-4, err_msg=k
        )


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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fused_inference_matches_across_mesh():
    """Data-parallel serving: the fused whole-chain inference program with
    the batch sharded over the mesh's data axis must reproduce the
    single-device per-image results (incl. the per-image cLight fits)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from inverserenderingofindoorscene_tpu.pipeline.inference import (
        InverseRenderer,
    )

    brdf_nets = BRDFNets(cascade_level=0)
    light_nets = LightNets(
        cascade_level=0, env_rows=ENV_RC[0], env_cols=ENV_RC[1]
    )
    bp = brdf_nets.init(jax.random.PRNGKey(0), IM_HW)
    lp = light_nets.init(jax.random.PRNGKey(1))
    stacks = [(brdf_nets, bp, light_nets, lp)]

    rng = np.random.RandomState(11)
    im = jnp.asarray(rng.rand(4, *IM_HW, 3).astype(np.float32) ** 2.2)
    small = jnp.asarray(rng.rand(4, *ENV_RC, 3).astype(np.float32) ** 2.2)

    out1 = InverseRenderer(stacks, is_light=True, fused=True)(im, small)

    mesh = make_mesh(jax.devices()[:8], tile=2)
    with jax.set_mesh(mesh):
        r8 = InverseRenderer(
            stacks, is_light=True, fused=True,
            param_sharding=replicated(mesh),
        )
        data_sh = NamedSharding(mesh, P("data"))
        out8 = r8(jax.device_put(im, data_sh), jax.device_put(small, data_sh))

    np.testing.assert_allclose(
        np.asarray(out8["light"]["c_light"]),
        np.asarray(out1["light"]["c_light"]),
        rtol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out8["preds"][-1]["albedo"]),
        np.asarray(out1["preds"][-1]["albedo"]),
        atol=2e-5,
    )
