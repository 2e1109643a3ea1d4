"""Fine-tune steps, cascade export, eval metrics, io utils."""

import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.data.synthetic import synthetic_batch
from inverserenderingofindoorscene_tpu.eval.metrics import (
    compute_whdr,
    normal_angle_error,
    si_log_depth_rmse,
)
from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
from inverserenderingofindoorscene_tpu.pipeline.export import (
    export_step,
    write_products,
)
from inverserenderingofindoorscene_tpu.pipeline.finetune import iiw_step, nyu_step
from inverserenderingofindoorscene_tpu.pipeline.light import LightNets
from inverserenderingofindoorscene_tpu.utils.io import (
    pred_to_shading,
    read_h5,
    write_h5,
)

IM_HW = (64, 64)
ENV_RC = (32, 32)


def test_iiw_step_and_grads():
    nets = BRDFNets(cascade_level=0)
    params = nets.init(jax.random.PRNGKey(0), IM_HW)
    rng = np.random.RandomState(0)
    b, n = 2, 50
    h, w = IM_HW
    batch = {
        "im": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "eq_point": jnp.asarray(rng.randint(0, h, (b, n, 4)), jnp.int32),
        "eq_weight": jnp.asarray(rng.rand(b, n), jnp.float32),
        "eq_num": jnp.asarray([n, n], jnp.int32),
        "darker_point": jnp.asarray(rng.randint(0, h, (b, n, 4)), jnp.int32),
        "darker_weight": jnp.asarray(rng.rand(b, n), jnp.float32),
        "darker_num": jnp.asarray([n, n], jnp.int32),
    }

    def loss(p):
        _, eq_l, dk_l = iiw_step(nets, p, batch)
        return eq_l + dk_l

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val)) and float(val) > 0
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0
    )
    assert gnorm > 0


def test_nyu_step_losses():
    nets = BRDFNets(cascade_level=0)
    params = nets.init(jax.random.PRNGKey(0), IM_HW)
    rng = np.random.RandomState(1)
    b = 2
    h2, w2 = IM_HW[0] * 2, IM_HW[1] * 2  # GT at higher res than the input
    normal = rng.uniform(-1, 1, (b, h2, w2, 3))
    normal[..., 2] = np.abs(normal[..., 2]) + 0.3
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    batch = {
        "im": jnp.asarray(rng.rand(b, *IM_HW, 3), jnp.float32),
        "normal": jnp.asarray(normal, jnp.float32),
        "depth": jnp.asarray(rng.rand(b, h2, w2, 1) * 8 + 0.5, jnp.float32),
        "seg_normal": jnp.asarray(
            (rng.rand(b, h2, w2, 1) > 0.3).astype(np.float32)
        ),
        "seg_depth": jnp.asarray(
            (rng.rand(b, h2, w2, 1) > 0.3).astype(np.float32)
        ),
    }
    preds, losses = jax.jit(lambda p, bt: nyu_step(nets, p, bt))(params, batch)
    for k in ("normal", "depth", "angle_deg"):
        assert np.isfinite(float(losses[k])), k
    assert preds["normal_full"].shape == (b, h2, w2, 3)
    assert 0 < float(losses["angle_deg"]) < 180


def test_export_write_products(tmp_path):
    brdf_nets = BRDFNets(cascade_level=0)
    light_nets = LightNets(
        cascade_level=0, env_rows=ENV_RC[0], env_cols=ENV_RC[1]
    )
    bp = brdf_nets.init(jax.random.PRNGKey(0), IM_HW)
    lp = light_nets.init(jax.random.PRNGKey(1))
    batch = synthetic_batch(batch=1, im_hw=IM_HW, env_rc=ENV_RC, seed=0)
    products, losses = jax.jit(
        lambda bp, lp, b: export_step(brdf_nets, light_nets, bp, lp, b)
    )(bp, lp, batch)
    assert products["env"].shape == (1, ENV_RC[0], ENV_RC[1], 84)
    # the normalization contract: albedo/depth mean == 1/3
    np.testing.assert_allclose(float(products["albedo"].mean()), 1 / 3, rtol=1e-4)
    np.testing.assert_allclose(float(products["depth"].mean()), 1 / 3, rtol=1e-4)

    names = [str(tmp_path / "im_1.hdr")]
    written = write_products(products, names, 0, env_ind=np.array([1.0]))
    assert len(written) == 7
    # h5 contract: CHW layout, 'data' key — same as the reference writer
    a = read_h5(str(tmp_path / "imbaseColor_1_0.h5"), hwc_from_chw=False)
    assert a.shape == (3, IM_HW[0], IM_HW[1])
    # skip_existing: second call writes nothing
    assert write_products(products, names, 0, env_ind=np.array([1.0])) == []


def test_whdr_synthetic():
    refl = np.ones((10, 10, 3))
    refl[:5] = 0.2  # top half darker
    judgements = {
        "intrinsic_points": [
            {"id": 1, "x": 0.1, "y": 0.1, "opaque": True},   # dark
            {"id": 2, "x": 0.1, "y": 0.9, "opaque": True},   # bright
            {"id": 3, "x": 0.9, "y": 0.9, "opaque": True},   # bright
        ],
        "intrinsic_comparisons": [
            {"point1": 1, "point2": 2, "darker": "1", "darker_score": 1.0},
            {"point1": 2, "point2": 3, "darker": "E", "darker_score": 1.0},
            {"point1": 2, "point2": 1, "darker": "1", "darker_score": 1.0},  # wrong
        ],
    }
    whdr, whdr_eq, whdr_ineq = compute_whdr(refl, judgements)
    np.testing.assert_allclose(whdr, 1 / 3)
    np.testing.assert_allclose(whdr_eq, 0.0)
    np.testing.assert_allclose(whdr_ineq, 0.5)


def test_normal_angle_and_depth_metrics():
    rng = np.random.RandomState(0)
    n = rng.uniform(-1, 1, (8, 8, 3))
    n[..., 2] = np.abs(n[..., 2]) + 0.3
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    mean, med = normal_angle_error(n, n * 127.5 + 0, np.ones((8, 8)))
    assert mean < 1e-3 and med < 1e-3

    d = rng.rand(8, 8) * 8 + 1.1
    assert si_log_depth_rmse(d * 2.0, d) < 1e-6  # scale-invariant
    assert si_log_depth_rmse(d + 3.0, d) > 0.01


def test_pred_to_shading_matches_sg_oracle():
    import oracle_np as onp

    rng = np.random.RandomState(3)
    r, c, k = 4, 6, 12
    axis = rng.uniform(-1, 1, (r, c, k, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    lamb01 = rng.rand(r, c, k) * 0.5
    w01 = rng.rand(r, c, k, 3) * 0.5
    flat = np.concatenate(
        [axis.reshape(r, c, -1), lamb01, w01.reshape(r, c, -1)], axis=-1
    )
    shading = pred_to_shading(flat, env_width=32, env_height=16, sg_num=k)
    assert shading.shape == (r, c, 3)
    # independent check: integral of SG envmap with cos*sin weights
    env = onp.sg_to_envmap_np(
        axis, onp.unsquash_np(lamb01), onp.unsquash_np(w01),
        env_height=16, env_width=32,
    )  # [r,c,512,3]
    el = ((np.arange(16) + 0.5) / 16) * np.pi / 2.0
    wgt = np.repeat(np.cos(el) * np.sin(el), 32)
    want = np.einsum("rcdk,d->rck", env, wgt)
    np.testing.assert_allclose(shading, np.maximum(want, 0), rtol=1e-5)


def test_cascade1_finetune_synthesize_pre():
    """Cascade-1 fine-tune on real data: the frozen cascade-0 stack
    synthesizes the *_pre inputs inline (trainFineTuneIIW_cascade1.py:
    300-362) and the 17-ch cascade-1 forward runs on them."""
    from inverserenderingofindoorscene_tpu.pipeline.finetune import (
        synthesize_pre,
    )

    brdf0 = BRDFNets(cascade_level=0)
    light0 = LightNets(
        cascade_level=0, env_rows=ENV_RC[0], env_cols=ENV_RC[1]
    )
    bp0 = brdf0.init(jax.random.PRNGKey(0), IM_HW)
    lp0 = light0.init(jax.random.PRNGKey(1))

    rng = np.random.RandomState(4)
    batch = {"im": jnp.asarray(rng.rand(2, *IM_HW, 3), jnp.float32)}
    full = jax.jit(
        lambda b: synthesize_pre(brdf0, light0, bp0, lp0, b)
    )(batch)
    for k in ("albedo_pre", "normal_pre", "rough_pre", "depth_pre",
              "diffuse_pre", "specular_pre", "env_pre"):
        assert k in full, k
        assert np.all(np.isfinite(np.asarray(full[k]))), k
    assert full["env_pre"].shape == (2, ENV_RC[0], ENV_RC[1], 84)
    # normal/rough shifted to [0,1]
    assert float(full["normal_pre"].min()) >= 0.0
    assert float(full["rough_pre"].max()) <= 1.0

    # cascade-1 IIW step consumes the synthesized batch
    nets1 = BRDFNets(cascade_level=1)
    p1 = nets1.init(jax.random.PRNGKey(2), IM_HW)
    n = 20
    full.update({
        "eq_point": jnp.asarray(rng.randint(0, IM_HW[0], (2, n, 4)), jnp.int32),
        "eq_weight": jnp.asarray(rng.rand(2, n), jnp.float32),
        "eq_num": jnp.asarray([n, n], jnp.int32),
        "darker_point": jnp.asarray(rng.randint(0, IM_HW[0], (2, n, 4)), jnp.int32),
        "darker_weight": jnp.asarray(rng.rand(2, n), jnp.float32),
        "darker_num": jnp.asarray([n, n], jnp.int32),
    })
    _, eq_l, dk_l = jax.jit(lambda p, b: iiw_step(nets1, p, b))(p1, full)
    assert np.isfinite(float(eq_l)) and np.isfinite(float(dk_l))


def test_compare_cli_end_to_end(tmp_path):
    """The eval CLI (cli/compare.py — the CompareWHDR/Normal/Depth
    driver equivalent) over on-disk products + GT: its numbers must
    equal eval/metrics.py on the same arrays, for the raw AND the
    --useBS (reference eval-input, CompareWHDR.py:72) product names."""
    cv2 = pytest.importorskip("cv2")
    import json

    from inverserenderingofindoorscene_tpu.cli import compare

    rng = np.random.RandomState(0)
    pred_root = tmp_path / "pred"
    gt_root = tmp_path / "gt"
    pred_root.mkdir()
    gt_root.mkdir()

    # --- WHDR: two images, one with no judgement file (skipped) ---
    refl = np.ones((10, 10, 3), np.float32)
    refl[:5] = 0.2
    np.save(pred_root / "a_albedo1.npy", refl)
    np.save(pred_root / "a_albedoBS1.npy", refl[::-1])  # distinct BS product
    np.save(pred_root / "skipme_albedo1.npy", refl)     # no GT json
    judgements = {
        "intrinsic_points": [
            {"id": 1, "x": 0.1, "y": 0.1, "opaque": True},
            {"id": 2, "x": 0.1, "y": 0.9, "opaque": True},
        ],
        "intrinsic_comparisons": [
            {"point1": 1, "point2": 2, "darker": "1", "darker_score": 1.0},
            {"point1": 2, "point2": 1, "darker": "1", "darker_score": 1.0},
        ],
    }
    (gt_root / "a.json").write_text(json.dumps(judgements))
    got = compare.main(["whdr", "--predRoot", str(pred_root),
                        "--gtRoot", str(gt_root)])
    np.testing.assert_allclose(got, compute_whdr(refl, judgements)[0])
    got_bs = compare.main(["whdr", "--predRoot", str(pred_root),
                           "--gtRoot", str(gt_root), "--useBS"])
    np.testing.assert_allclose(
        got_bs, compute_whdr(refl[::-1], judgements)[0]
    )

    # --- normal: pred npy vs GT png + mask png, CLI resize path ---
    n = rng.uniform(-1, 1, (8, 8, 3))
    n[..., 2] = np.abs(n[..., 2]) + 0.3
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    np.save(pred_root / "a_normal1.npy", n.astype(np.float32))
    gt_png = np.clip((n * 127.5 + 127.5), 0, 255).astype(np.uint8)
    cv2.imwrite(str(gt_root / "a.png"), gt_png[:, :, ::-1])
    mask = np.zeros((8, 8), np.uint8)
    mask[2:6] = 255
    cv2.imwrite(str(gt_root / "a_mask.png"), np.stack([mask] * 3, -1))
    got = compare.main(["normal", "--predRoot", str(pred_root),
                        "--gtRoot", str(gt_root)])
    gt_dec = cv2.imread(str(gt_root / "a.png"))[:, :, ::-1].astype(
        np.float32
    )
    exp_mean, _ = normal_angle_error(
        np.load(pred_root / "a_normal1.npy"),  # the CLI's f32 product
        (gt_dec - 127.5) / 127.5, (mask == 255).astype(np.float32),
    )
    np.testing.assert_allclose(got, exp_mean, rtol=1e-6)

    # --- depth: pred npy (resized by the CLI) vs float tiff GT ---
    d = (rng.rand(8, 8) * 8 + 1.1).astype(np.float32)
    np.save(pred_root / "a_depth1.npy", d[..., None])
    np.save(pred_root / "a_depthBS1.npy", 2.0 * d[..., None])
    gt_d = (rng.rand(16, 16) * 8 + 1.1).astype(np.float32)
    assert cv2.imwrite(str(gt_root / "a.tiff"), gt_d)
    got = compare.main(["depth", "--predRoot", str(pred_root),
                        "--gtRoot", str(gt_root)])
    d_res = cv2.resize(d, (16, 16), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(
        got, si_log_depth_rmse(d_res, gt_d.astype(np.float64)), rtol=1e-6
    )
    # scale-invariance: the 2x-scaled BS depth gives the same RMSE
    got_bs = compare.main(["depth", "--predRoot", str(pred_root),
                           "--gtRoot", str(gt_root), "--useBS"])
    np.testing.assert_allclose(got_bs, got, rtol=1e-6)
