"""End-to-end pipeline/train-step tests at tiny resolution.

Reference equations are re-verified structurally (masked normalization,
LSregress detach semantics, loss weighting); numerics vs the reference are
covered by the oracle tests in test_core_render.py / test_losses.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inverserenderingofindoorscene_tpu.data.synthetic import synthetic_batch
from inverserenderingofindoorscene_tpu.pipeline.brdf import (
    BRDFNets,
    brdf_step,
    brdf_total_error,
)
from inverserenderingofindoorscene_tpu.pipeline.light import LightNets, light_step
from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    make_brdf_train_step,
    make_light_train_step,
    reference_adam,
)

IM_HW = (64, 64)
ENV_RC = (32, 32)
LIGHT_HW = (128, 128)


def tiny_batch(cascade_level=0, batch=2, seed=0):
    return synthetic_batch(
        batch=batch,
        im_hw=IM_HW,
        env_rc=ENV_RC,
        cascade_level=cascade_level,
        seed=seed,
    )


def tiny_light_nets(cascade_level=0):
    return LightNets(
        cascade_level=cascade_level, env_rows=ENV_RC[0], env_cols=ENV_RC[1]
    )


@pytest.mark.parametrize("cascade_level", [0, 1])
def test_brdf_step_shapes_and_finite(cascade_level):
    nets = BRDFNets(cascade_level=cascade_level)
    params = nets.init(jax.random.PRNGKey(0), IM_HW)
    batch = tiny_batch(cascade_level)
    preds, errors = jax.jit(
        lambda p, b: brdf_step(nets, p, b)
    )(params, batch)
    b, h, w = batch["im"].shape[:3]
    assert preds["albedo"].shape == (b, h, w, 3)
    assert preds["normal"].shape == (b, h, w, 3)
    assert preds["rough"].shape == (b, h, w, 1)
    assert preds["depth"].shape == (b, h, w, 1)
    # normals unit-norm, albedo/depth in range
    nn = np.linalg.norm(np.asarray(preds["normal"]), axis=-1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-4)
    assert float(preds["albedo"].min()) >= 0.0
    assert float(preds["albedo"].max()) <= 1.0
    for k, v in errors.items():
        assert np.isfinite(float(v)), k
    total = brdf_total_error(errors)
    assert np.isfinite(float(total))


def test_fused_decoders_match_unfused():
    """The vmapped 4-trunk path is the sequential path up to conv
    accumulation-order noise (the normal head's L2-normalize amplifies
    it near zero-norm pixels, hence the looser tolerance there)."""
    import dataclasses

    from inverserenderingofindoorscene_tpu.pipeline.brdf import brdf_forward

    nets = BRDFNets(cascade_level=0, fuse_decoders=True)
    params = nets.init(jax.random.PRNGKey(0), IM_HW)
    batch = tiny_batch()
    fused = jax.jit(lambda p, b: brdf_forward(nets, p, b))(params, batch)
    unfused = jax.jit(
        lambda p, b: brdf_forward(
            dataclasses.replace(nets, fuse_decoders=False), p, b
        )
    )(params, batch)
    for k in fused:
        tol = 1e-4 if k == "normal" else 5e-6
        np.testing.assert_allclose(
            np.asarray(fused[k]), np.asarray(unfused[k]), atol=tol, err_msg=k
        )


def test_brdf_train_step_descends():
    nets = BRDFNets(cascade_level=0)
    params = nets.init(jax.random.PRNGKey(0), IM_HW)
    tx = reference_adam(1e-3)
    state = create_train_state(params, tx)
    step = jax.jit(make_brdf_train_step(nets))
    batch = tiny_batch()
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 4


def test_light_step_losses_finite_and_grads_flow():
    brdf_nets = BRDFNets(cascade_level=0)
    light_nets = tiny_light_nets()
    bp = brdf_nets.init(jax.random.PRNGKey(0), IM_HW)
    lp = light_nets.init(jax.random.PRNGKey(1), LIGHT_HW)
    batch = tiny_batch()

    def loss_fn(lp):
        losses, _ = light_step(brdf_nets, light_nets, bp, lp, batch)
        return 10.0 * losses["reconst"] + losses["render"], losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(lp)
    assert np.isfinite(float(total))
    for k in ("albedo", "normal", "rough", "depth", "reconst", "render"):
        assert np.isfinite(float(losses[k])), k
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0
    )
    assert gnorm > 0.0


def test_light_train_step_descends():
    brdf_nets = BRDFNets(cascade_level=0)
    light_nets = tiny_light_nets()
    bp = brdf_nets.init(jax.random.PRNGKey(0), IM_HW)
    lp = light_nets.init(jax.random.PRNGKey(1), LIGHT_HW)
    state = create_train_state(lp, reference_adam(3e-4))
    step = jax.jit(make_light_train_step(brdf_nets, light_nets, bp))
    batch = tiny_batch()
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total"]))
    assert min(losses[1:]) < losses[0], losses


def test_light_step_cascade1():
    brdf_nets = BRDFNets(cascade_level=1)
    light_nets = tiny_light_nets(cascade_level=1)
    bp = brdf_nets.init(jax.random.PRNGKey(0), IM_HW)
    lp = light_nets.init(jax.random.PRNGKey(1), LIGHT_HW)
    batch = tiny_batch(cascade_level=1)
    losses, aux = jax.jit(
        lambda bp, lp, b: light_step(brdf_nets, light_nets, bp, lp, b)
    )(bp, lp, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert aux["sg"]["sg_flat"].shape == (2, ENV_RC[0], ENV_RC[1], 84)


def test_bf16_compute_matches_f32():
    """Mixed-precision parity: bf16 conv stacks, f32 params/heads/losses."""
    batch = tiny_batch()
    losses = {}
    for dt in ("float32", "bfloat16"):
        nets = BRDFNets(cascade_level=0, compute_dtype=dt)
        params = nets.init(jax.random.PRNGKey(0), IM_HW)
        _, errors = jax.jit(lambda p, b: brdf_step(nets, p, b))(params, batch)
        losses[dt] = float(brdf_total_error(errors))
    assert abs(losses["bfloat16"] - losses["float32"]) / losses["float32"] < 0.02, losses


def test_bf16_light_step_matches_f32():
    """Light-step mixed-precision parity.  bf16 mode assembles AND
    resizes the 11-ch light input in bf16 (light_input_from_preds's
    pre-resize cast, a deliberate perf tradeoff documented in
    BASELINE.md) — tolerance sized for that: bf16 has ~3 significant
    digits, and the SG/loss heads stay f32."""
    batch = tiny_batch()
    losses = {}
    for dt in ("float32", "bfloat16"):
        brdf_nets = BRDFNets(cascade_level=0, compute_dtype=dt)
        light_nets = LightNets(
            cascade_level=0, env_rows=ENV_RC[0], env_cols=ENV_RC[1],
            compute_dtype=dt,
        )
        bp = brdf_nets.init(jax.random.PRNGKey(0), IM_HW)
        lp = light_nets.init(jax.random.PRNGKey(1), LIGHT_HW)
        out, _ = jax.jit(
            lambda bp, lp, b: light_step(brdf_nets, light_nets, bp, lp, b)
        )(bp, lp, batch)
        losses[dt] = float(10.0 * out["reconst"] + out["render"])
    rel = abs(losses["bfloat16"] - losses["float32"]) / abs(losses["float32"])
    assert rel < 0.05, losses


def test_inverse_renderer_api(tmp_path):
    """Library-level single-call inference (pipeline.inference): one
    cascade with lighting + bilateral refinement from a photo on disk,
    incl. the aspect-preserving resize and fov-by-orientation rule."""
    cv2 = pytest.importorskip("cv2")
    from inverserenderingofindoorscene_tpu.pipeline import InverseRenderer

    rng = np.random.RandomState(0)
    path = str(tmp_path / "photo.png")
    # square source: the aspect-preserving fit keeps the full 32-row
    # lighting grid (the 8-deep stride-2 light encoder needs >=eh*4=128
    # input rows; a TALLER grid than the source aspect allows would
    # collapse its deepest feature map to zero rows)
    cv2.imwrite(path, (rng.rand(64, 64, 3) * 255).astype(np.uint8))

    brdf = BRDFNets(cascade_level=0)
    light = tiny_light_nets()
    bp = brdf.init(jax.random.PRNGKey(0), IM_HW)
    lp = light.init(jax.random.PRNGKey(1), LIGHT_HW)
    r = InverseRenderer([(brdf, bp, light, lp)], is_light=True, is_bs=True)
    out = r.render_file(path, im_hw=IM_HW, env_rc=ENV_RC)

    assert len(out["preds"]) == 1
    preds = out["preds"][0]
    assert preds["albedo"].shape == (1, 64, 64, 3)
    assert out["light"] is not None and out["refined"] is not None
    assert len(out["refined"]) == 1  # one refined dict per cascade level
    assert np.isfinite(float(out["light"]["c_light"]))
    for k in ("albedo", "rough", "depth"):
        arr = np.asarray(out["refined"][-1][k])
        assert arr.shape[:3] == (1, 64, 64), k
        assert np.all(np.isfinite(arr)), k
    assert np.asarray(out["light"]["env_img"]).shape[1:3] == ENV_RC


def test_fused_chain_matches_staged():
    """fused=True (whole chain in one XLA program, jnp.where scale
    disambiguation) must reproduce the staged per-stage programs (host
    Python branch) on a two-cascade stack."""
    from inverserenderingofindoorscene_tpu.pipeline import InverseRenderer

    rng = np.random.RandomState(3)
    im = jnp.asarray(rng.rand(1, *IM_HW, 3).astype(np.float32) ** 2.2)
    im_small = jnp.asarray(
        rng.rand(1, *ENV_RC, 3).astype(np.float32) ** 2.2
    )

    stacks = []
    for lvl in range(2):
        brdf = BRDFNets(cascade_level=lvl)
        light = tiny_light_nets(cascade_level=lvl)
        bp = brdf.init(jax.random.PRNGKey(10 + lvl), IM_HW)
        lp = light.init(jax.random.PRNGKey(20 + lvl), LIGHT_HW)
        stacks.append((brdf, bp, light, lp))

    staged = InverseRenderer(stacks, is_light=True)(im, im_small, 57.0)
    fused = InverseRenderer(stacks, is_light=True, fused=True)(
        im, im_small, 57.0
    )

    assert len(fused["preds"]) == 2
    for k in ("albedo", "normal", "rough", "depth"):
        np.testing.assert_allclose(
            np.asarray(fused["preds"][-1][k]),
            np.asarray(staged["preds"][-1][k]),
            atol=2e-5, err_msg=k,
        )
    # the staged path computes cLight/cAlbedo in float64 host arithmetic,
    # the fused path in f32 on device — identical branch, ~1e-6 rel noise
    for k in ("c_albedo", "c_light"):
        np.testing.assert_allclose(
            float(fused["light"][k][0]), float(staged["light"][k]),
            rtol=1e-4, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(fused["light"]["env_img"]),
        np.asarray(staged["light"]["env_img"]),
        rtol=1e-3, atol=1e-5,
    )

    # batched serving: the traced cLight/cAlbedo fit is per image, so a
    # B2 batch must reproduce the two B1 runs (the host/staged path, like
    # the reference driver, is strictly B1)
    rng = np.random.RandomState(7)
    im2 = jnp.asarray(rng.rand(2, *IM_HW, 3).astype(np.float32) ** 2.2)
    small2 = jnp.asarray(rng.rand(2, *ENV_RC, 3).astype(np.float32) ** 2.2)
    r = InverseRenderer(stacks, is_light=True, fused=True)
    out2 = r(im2, small2, 57.0)
    for i in range(2):
        out1 = r(im2[i : i + 1], small2[i : i + 1], 57.0)
        np.testing.assert_allclose(
            float(out2["light"]["c_light"][i]),
            float(out1["light"]["c_light"][0]),
            rtol=1e-4, err_msg=f"image {i}",
        )
    assert not np.isclose(
        float(out2["light"]["c_light"][0]),
        float(out2["light"]["c_light"][1]),
    ), "distinct images should get distinct per-image scales"

    # the staged path fits ONE global scale (reference B1 semantics) and
    # must reject batches instead of silently blending them
    with pytest.raises(ValueError, match="fused=True"):
        InverseRenderer(stacks, is_light=True)(im2, small2, 57.0)

    # batched bilateral refinement: per-image guide normalization and
    # unit confidences — B2 must reproduce the two B1 runs, at EVERY
    # cascade level (the reference refines each level with its own BS
    # stack, testReal.py:532-540)
    rb = InverseRenderer(stacks, is_light=True, is_bs=True, fused=True,
                         v_max="full")
    ref2 = rb(im2, small2, 57.0)["refined"]
    assert len(ref2) == 2  # one refined dict per cascade level
    for i in range(2):
        ref1 = rb(im2[i : i + 1], small2[i : i + 1], 57.0)["refined"]
        for lvl in range(2):
            for k in ("albedo", "rough", "depth"):
                np.testing.assert_allclose(
                    np.asarray(ref2[lvl][k][i]),
                    np.asarray(ref1[lvl][k][0]),
                    atol=1e-5, err_msg=f"{k} level {lvl} image {i}",
                )

    # AOT deployment artifact: serialize the fused chain (jax.export
    # StableHLO), rehydrate WITHOUT the model objects, compare outputs
    from inverserenderingofindoorscene_tpu.pipeline.inference import (
        deserialize_chain,
    )

    blob, params = r.serialize(IM_HW, ENV_RC, fov=57.0, batch=2)
    assert isinstance(blob, bytes) and len(blob) > 0
    served = deserialize_chain(blob)(params, im2, small2)
    np.testing.assert_allclose(
        np.asarray(served["light"]["c_light"]),
        np.asarray(out2["light"]["c_light"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(served["preds"][-1]["albedo"]),
        np.asarray(out2["preds"][-1]["albedo"]),
        atol=1e-6,
    )
