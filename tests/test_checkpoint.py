"""Checkpoint save/restore roundtrip (orbax) with the stage naming contract."""

import numpy as np

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    reference_adam,
)
from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt


def _small_params():
    """A small nested pytree with realistic structure (dict-of-dicts of
    arrays).  The naming/restore CONTRACT is structure-independent and the
    real-net restores are exercised by the CLI smoke tests (train_light /
    test_synthetic load brdf checkpoints); full BRDF trees here only made
    the fast gate pay ~30 s of orbax serialization."""
    k = jax.random.PRNGKey(0)
    return {
        "encoder": {"conv1": {"kernel": jax.random.normal(k, (3, 3, 3, 8)),
                              "bias": jnp.zeros((8,))}},
        "decoder": {"conv1": {"kernel": jax.random.normal(k, (3, 3, 8, 4))}},
    }


def test_roundtrip_and_latest_epoch(tmp_path):
    exp = str(tmp_path / "exp")
    params = _small_params()
    state = create_train_state(params, reference_adam(1e-4))

    assert ckpt.latest_epoch(exp, "brdf", 0) is None
    ckpt.save_checkpoint(exp, "brdf", 0, 3, state)
    ckpt.save_checkpoint(exp, "brdf", 0, 7, state)
    assert ckpt.latest_epoch(exp, "brdf", 0) == 7

    # perturb, then restore epoch 7 and verify params equal the saved ones
    perturbed = state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
    )
    restored = ckpt.restore_checkpoint(exp, "brdf", 0, 7, perturbed)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), restored.params,
        state.params,
    )
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0
    assert int(restored.step) == int(state.step)


def test_sharded_state_roundtrip(tmp_path):
    """Mesh-sharded TrainState save/restore: restored leaves keep their
    {data, tile} NamedShardings and params are bitwise-identical — the
    multi-host resume contract behind docs/scaling.md (the reference's
    equivalent is single-process torch.save, trainBRDF.py:392-396)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from inverserenderingofindoorscene_tpu.parallel.mesh import (
        make_mesh,
        replicated,
    )

    mesh = make_mesh(jax.devices()[:8], tile=2)
    sh_dt = NamedSharding(mesh, P("data", "tile"))
    rep = replicated(mesh)

    k = jax.random.PRNGKey(1)
    params = {
        "w": jax.device_put(jax.random.normal(k, (8, 16)), sh_dt),
        "b": jax.device_put(jnp.arange(4.0), rep),
    }
    state = create_train_state(params, reference_adam(1e-4))
    state = state.replace(step=jax.device_put(state.step, rep))

    exp = str(tmp_path / "exp")
    ckpt.save_checkpoint(exp, "light", 1, 2, state)

    target = jax.tree_util.tree_map(jnp.zeros_like, state)
    target = jax.device_put(
        target,
        jax.tree_util.tree_map(
            lambda x: x.sharding, state,
            is_leaf=lambda x: isinstance(x, jax.Array),
        ),
    )
    restored = ckpt.restore_checkpoint(exp, "light", 1, 2, target)

    # shardings survive the round trip...
    assert restored.params["w"].sharding.is_equivalent_to(sh_dt, 2)
    assert restored.params["b"].sharding.is_equivalent_to(rep, 1)
    # ...and every leaf is bitwise-identical (incl. Adam moments)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lr_scale_rule():
    # trainBRDF.py:90-103: 1/2^floor((epoch+1)/10)
    assert ckpt.lr_scale_for_epoch(0) == 1.0
    assert ckpt.lr_scale_for_epoch(8) == 1.0
    assert ckpt.lr_scale_for_epoch(9) == 0.5
    assert ckpt.lr_scale_for_epoch(19) == 0.25


def test_cross_stage_restore_schedule_vs_constant(tmp_path):
    """A checkpoint saved by a training driver (scheduled Adam) must load
    into a stage that builds its restore target with constant-lr Adam —
    the cross-stage hand-off every loader relies on."""
    exp = str(tmp_path / "exp")
    params = _small_params()
    trained = create_train_state(
        params, reference_adam(1e-4, epoch_decay_steps=100)
    )
    ckpt.save_checkpoint(exp, "brdf", 0, 0, trained)

    target = create_train_state(params, reference_adam(1e-4))
    restored = ckpt.restore_checkpoint(exp, "brdf", 0, 0, target)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), restored.params,
        trained.params,
    )
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0
