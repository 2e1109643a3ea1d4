"""Exercise the explicit `axis_name`/psum branches under `jax.shard_map`.

`tests/test_parallel.py` covers the GSPMD route (plain jit over a sharded
batch, `axis_name=None`); these tests drive the OTHER route every
`make_*_train_step` exposes: per-device programs glued by explicit
`lax.psum`/`pmean` collectives (SURVEY.md §4 distributed-test recipe;
reference parallelism anchor: /root/reference/trainBRDF.py:105-109).
Single-device jit is the ground truth; the shard_map result must match in
both metrics and updated params.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from inverserenderingofindoorscene_tpu.data.synthetic import synthetic_batch
from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
from inverserenderingofindoorscene_tpu.pipeline.light import LightNets
from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    make_brdf_train_step,
    make_iiw_train_step,
    make_light_train_step,
    make_nyu_train_step,
    reference_adam,
)

IM_HW = (64, 64)
ENV_RC = (32, 32)

needs8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

# Excluded from the fast pre-commit gate (pytest -m 'not slow'); see
# [tool.pytest.ini_options] in pyproject.toml.
pytestmark = pytest.mark.slow


def data_mesh():
    return Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))


def shard_mapped(step, mesh):
    """step(state, batch) under shard_map: params replicated, batch split
    over 'data'."""
    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=(P(), P()),
        )
    )


def assert_step_parity(step_single, step_shard, params, batch, mesh,
                       rtol=2e-4, param_tol=3e-4):
    state1 = create_train_state(params, reference_adam(1e-4))
    state1, m1 = jax.jit(step_single)(state1, batch)

    state8 = create_train_state(params, reference_adam(1e-4))
    state8, m8 = step_shard(state8, batch)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=rtol, err_msg=k
        )
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state1.params,
        jax.device_get(state8.params),
    )
    # Adam normalizes by sqrt(v): near-zero grads can flip the update sign
    # under a different f32 reduction order, bounding drift by ~2*lr.
    max_diff = max(jax.tree_util.tree_leaves(diff))
    assert max_diff < param_tol, max_diff


@needs8
def test_brdf_step_psum_matches_single_device():
    nets = BRDFNets(cascade_level=0)
    params = nets.init(jax.random.PRNGKey(0), IM_HW)
    batch = synthetic_batch(batch=8, im_hw=IM_HW, env_rc=ENV_RC, seed=0)

    mesh = data_mesh()
    step1 = make_brdf_train_step(nets)
    step8 = shard_mapped(make_brdf_train_step(nets, axis_name="data"), mesh)
    assert_step_parity(step1, step8, params, batch, mesh)


@needs8
def test_light_step_psum_matches_single_device():
    brdf_nets = BRDFNets(cascade_level=0)
    light_nets = LightNets(
        cascade_level=0, env_rows=ENV_RC[0], env_cols=ENV_RC[1]
    )
    bp = brdf_nets.init(jax.random.PRNGKey(0), IM_HW)
    lp = light_nets.init(jax.random.PRNGKey(1))
    batch = synthetic_batch(batch=8, im_hw=IM_HW, env_rc=ENV_RC, seed=1)

    mesh = data_mesh()
    step1 = make_light_train_step(brdf_nets, light_nets, bp)
    step8 = shard_mapped(
        make_light_train_step(brdf_nets, light_nets, bp, axis_name="data"),
        mesh,
    )

    state1 = create_train_state(lp, reference_adam(1e-4))
    state1, m1 = jax.jit(step1)(state1, batch)
    state8 = create_train_state(lp, reference_adam(1e-4))
    state8, m8 = step8(state8, batch)
    for k in ("reconst", "render", "total"):
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=5e-4, err_msg=k
        )


def _iiw_batch(b, seed=0, n=6):
    rng = np.random.RandomState(seed)
    h, w = IM_HW
    batch = {
        "im": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "eq_point": jnp.asarray(rng.randint(0, h, (b, n, 4)), jnp.int32),
        "eq_weight": jnp.asarray(rng.rand(b, n), jnp.float32),
        "eq_num": jnp.asarray(rng.randint(1, n + 1, (b,)), jnp.int32),
        "darker_point": jnp.asarray(rng.randint(0, h, (b, n, 4)), jnp.int32),
        "darker_weight": jnp.asarray(rng.rand(b, n), jnp.float32),
        "darker_num": jnp.asarray(rng.randint(1, n + 1, (b,)), jnp.int32),
    }
    return batch


@needs8
def test_iiw_step_pmean_matches_single_device():
    nets = BRDFNets(cascade_level=0)
    params = nets.init(jax.random.PRNGKey(2), IM_HW)
    batch = _iiw_batch(8, seed=2)

    mesh = data_mesh()
    step1 = make_iiw_train_step(nets)
    step8 = shard_mapped(make_iiw_train_step(nets, axis_name="data"), mesh)
    assert_step_parity(step1, step8, params, batch, mesh)


@needs8
def test_nyu_step_psum_matches_single_device():
    rng = np.random.RandomState(3)
    b = 8
    h, w = IM_HW
    nets = BRDFNets(cascade_level=0)
    params = nets.init(jax.random.PRNGKey(3), IM_HW)
    normal = rng.uniform(-1, 1, (b, h, w, 3))
    normal[..., 2] = np.abs(normal[..., 2]) + 0.3
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    batch = {
        "im": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "normal": jnp.asarray(normal, jnp.float32),
        "depth": jnp.asarray(rng.uniform(0.1, 5, (b, h, w, 1)), jnp.float32),
        "seg_normal": jnp.asarray(
            rng.rand(b, h, w, 1) > 0.2, jnp.float32
        ),
        "seg_depth": jnp.asarray(rng.rand(b, h, w, 1) > 0.2, jnp.float32),
    }

    mesh = data_mesh()
    step1 = make_nyu_train_step(nets)
    step8 = shard_mapped(make_nyu_train_step(nets, axis_name="data"), mesh)
    assert_step_parity(step1, step8, params, batch, mesh)


# ---------------------------------------------------------------------------
# multihost helpers (parallel/multihost.py) on the single-process mesh
# ---------------------------------------------------------------------------


@needs8
def test_global_batch_from_local_assembles_and_shards():
    from inverserenderingofindoorscene_tpu.parallel.mesh import make_mesh
    from inverserenderingofindoorscene_tpu.parallel.multihost import (
        global_batch_from_local,
    )

    rng = np.random.RandomState(0)
    local = {
        "im": rng.rand(8, 16, 16, 3).astype(np.float32),
        "env_gt": rng.rand(8, 4, 4, 8, 3).astype(np.float32),
    }
    mesh = make_mesh(jax.devices()[:8], tile=2)
    g = global_batch_from_local(local, mesh, tile_dims={"env_gt": 2})

    # single process: the global array IS the local batch
    for k in local:
        np.testing.assert_array_equal(np.asarray(g[k]), local[k])
    # dim 0 split over 'data' (4 ways), env cols over 'tile' (2 ways)
    im_shard = g["im"].addressable_shards[0].data
    assert im_shard.shape == (2, 16, 16, 3)
    env_shard = g["env_gt"].addressable_shards[0].data
    assert env_shard.shape == (2, 4, 2, 8, 3)
    # a sharded batch feeds a jitted global computation unchanged
    total = jax.jit(lambda b: sum(jnp.sum(v) for v in b.values()))(g)
    np.testing.assert_allclose(
        float(total), sum(v.sum() for v in local.values()), rtol=1e-6
    )


def test_local_batch_slice_partitions_batch():
    from inverserenderingofindoorscene_tpu.parallel.multihost import (
        local_batch_slice,
    )

    rows = [local_batch_slice(i, 4, 16) for i in range(4)]
    assert rows == [(0, 4), (4, 8), (8, 12), (12, 16)]
    # covers the whole batch exactly once
    seen = [r for s, e in rows for r in range(s, e)]
    assert seen == list(range(16))
