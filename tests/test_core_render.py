"""Core SG lighting + shading: jnp vs float64 numpy oracle vs torch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core import brdf, scale, sg
from inverserenderingofindoorscene_tpu.core.render_layer import RenderLayer

import oracle_np as onp


def _rand_sg(rng, b=2, h=6, w=9, sgn=12):
    axis = rng.standard_normal((b, h, w, sgn, 3))
    axis = axis / np.linalg.norm(axis, axis=-1, keepdims=True)
    lamb01 = rng.uniform(0.05, 0.95, (b, h, w, sgn))
    weight01 = rng.uniform(0.0, 0.9, (b, h, w, sgn, 3))
    return axis, lamb01, weight01


def _rand_brdf(rng, b=2, h=6, w=9, d=128):
    albedo = rng.uniform(0, 1, (b, h, w, 3))
    normal = rng.standard_normal((b, h, w, 3))
    normal[..., 2] += 2.5  # bias toward camera like real normals
    normal = normal / np.linalg.norm(normal, axis=-1, keepdims=True)
    rough = rng.uniform(-1, 1, (b, h, w, 1))
    envmap = rng.uniform(0, 2, (b, h, w, d, 3))
    return albedo, normal, rough, envmap


class TestSGEnvmap:
    def test_matches_numpy_oracle_f64(self):
        rng = np.random.default_rng(0)
        axis, lamb01, weight01 = _rand_sg(rng)
        env_j, _, lamb, weight = sg.squashed_sg_to_envmap(
            jnp.asarray(axis), jnp.asarray(lamb01), jnp.asarray(weight01)
        )
        env_np = onp.sg_to_envmap_np(
            axis, onp.unsquash_np(lamb01), onp.unsquash_np(weight01)
        )
        np.testing.assert_allclose(np.asarray(env_j), env_np, rtol=1e-10, atol=1e-10)

    def test_grad_matches_numeric(self):
        rng = np.random.default_rng(1)
        axis, lamb01, weight01 = _rand_sg(rng, b=1, h=2, w=2, sgn=3)
        cot = rng.standard_normal((1, 2, 2, 128, 3))

        def f(lamb01_):
            env = sg.sg_to_envmap(
                jnp.asarray(axis), sg.unsquash(lamb01_), sg.unsquash(jnp.asarray(weight01))
            )
            return jnp.sum(env * cot)

        g = jax.grad(f)(jnp.asarray(lamb01))
        eps = 1e-6
        l0 = np.array(lamb01)
        lp = l0.copy(); lp[0, 0, 0, 0] += eps
        lm = l0.copy(); lm[0, 0, 0, 0] -= eps
        fd = (float(f(jnp.asarray(lp))) - float(f(jnp.asarray(lm)))) / (2 * eps)
        np.testing.assert_allclose(float(g[0, 0, 0, 0]), fd, rtol=1e-5)


class TestRenderEnvmap:
    def test_matches_numpy_oracle_f64(self):
        rng = np.random.default_rng(2)
        albedo, normal, rough, envmap = _rand_brdf(rng)
        dj, sj = brdf.render_envmap(
            jnp.asarray(albedo), jnp.asarray(normal), jnp.asarray(rough),
            jnp.asarray(envmap),
        )
        dn, sn = onp.render_envmap_np(albedo, normal, rough, envmap)
        np.testing.assert_allclose(np.asarray(dj), dn, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(sj), sn, rtol=1e-9, atol=1e-11)

    def test_full_pipeline_sg_to_render(self):
        """SG params -> envmap -> shading, all f64, vs oracle composition."""
        rng = np.random.default_rng(3)
        axis, lamb01, weight01 = _rand_sg(rng, b=1, h=4, w=4)
        albedo, normal, rough, _ = _rand_brdf(rng, b=1, h=4, w=4)

        env_j, *_ = sg.squashed_sg_to_envmap(
            jnp.asarray(axis), jnp.asarray(lamb01), jnp.asarray(weight01)
        )
        dj, sj = brdf.render_envmap(
            jnp.asarray(albedo), jnp.asarray(normal), jnp.asarray(rough), env_j
        )
        env_n = onp.sg_to_envmap_np(
            axis, onp.unsquash_np(lamb01), onp.unsquash_np(weight01)
        )
        dn, sn = onp.render_envmap_np(albedo, normal, rough, env_n)
        np.testing.assert_allclose(np.asarray(dj), dn, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(sj), sn, rtol=1e-8, atol=1e-10)


@pytest.fixture(scope="module")
def torch_ref():
    torch = pytest.importorskip("torch")
    import os, sys
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not mounted")
    sys.path.insert(0, "/root/reference")
    import models as ref_models  # noqa
    return torch, ref_models


class TestAgainstTorchReference:
    """BASELINE.json gate: images + pixel gradients allclose vs the
    reference PyTorch rendering layer on CPU (models.py:348-522)."""

    def test_output2env_allclose(self, torch_ref):
        torch, ref_models = torch_ref
        rng = np.random.default_rng(4)
        b, hh, ww, sgn = 1, 8, 10, 12
        axis, lamb01, weight01 = _rand_sg(rng, b, hh, ww, sgn)

        o2e = ref_models.output2env(SGNum=sgn, isCuda=False)
        # reference layout: axis [B, SG, 3, H, W]; lamb/weight [B, SG(*3), H, W]
        ax_t = torch.from_numpy(
            axis.transpose(0, 3, 4, 1, 2).astype(np.float32)
        )
        lam_t = torch.from_numpy(
            lamb01.transpose(0, 3, 1, 2).astype(np.float32)
        )
        wt_t = torch.from_numpy(
            weight01.transpose(0, 3, 4, 1, 2).reshape(b, sgn * 3, hh, ww).astype(np.float32)
        )
        env_ref, *_ = o2e.output2env(ax_t, lam_t, wt_t)  # [B,3,H,W,eh,ew]
        env_ref = env_ref.detach().numpy()

        env_j, *_ = sg.squashed_sg_to_envmap(
            jnp.asarray(axis, jnp.float32),
            jnp.asarray(lamb01, jnp.float32),
            jnp.asarray(weight01, jnp.float32),
        )  # [B,H,W,D,3]
        env_j = np.asarray(env_j).reshape(b, hh, ww, 8, 16, 3).transpose(0, 5, 1, 2, 3, 4)
        np.testing.assert_allclose(env_j, env_ref, rtol=2e-4, atol=2e-4)

    def test_forward_env_image_and_grads_allclose(self, torch_ref):
        torch, ref_models = torch_ref
        rng = np.random.default_rng(5)
        b, hh, ww = 1, 12, 16
        albedo, normal, rough, envmap = _rand_brdf(rng, b, hh, ww)
        # Scale normals off unit length: forwardEnv renormalizes with
        # clamp(sum n^2, 1e-6, 1) and a unit normal sits exactly on the
        # clamp boundary, where f32 summation-order differences between
        # torch and XLA pick different clamp branches (saturated = no
        # projection term in the gradient). The boundary is measure-zero
        # and chaotic in the reference itself; test clearly off it.
        normal = normal * np.where(
            (np.arange(hh * ww) % 2 == 0).reshape(1, hh, ww, 1), 0.8, 1.25
        )

        rl = ref_models.renderingLayer(
            imWidth=ww, imHeight=hh, fov=57, isCuda=False
        )
        a_t = torch.from_numpy(
            albedo.transpose(0, 3, 1, 2).astype(np.float32)
        ).requires_grad_(True)
        n_t = torch.from_numpy(
            normal.transpose(0, 3, 1, 2).astype(np.float32)
        ).requires_grad_(True)
        r_t = torch.from_numpy(
            rough.transpose(0, 3, 1, 2).astype(np.float32)
        ).requires_grad_(True)
        e_t = torch.from_numpy(
            envmap.reshape(b, hh, ww, 8, 16, 3)
            .transpose(0, 5, 1, 2, 3, 4)
            .astype(np.float32)
        ).requires_grad_(True)
        d_ref, s_ref = rl.forwardEnv(a_t, n_t, r_t, e_t)
        loss_ref = (d_ref * d_ref).sum() + (s_ref * 2.0).sum()
        loss_ref.backward()

        def f(a, n, r, e):
            d, s = brdf.render_envmap(a, n, r, e)
            return jnp.sum(d * d) + jnp.sum(s * 2.0), (d, s)

        args = (
            jnp.asarray(albedo, jnp.float32),
            jnp.asarray(normal, jnp.float32),
            jnp.asarray(rough, jnp.float32),
            jnp.asarray(envmap, jnp.float32),
        )
        (loss_j, (d_j, s_j)), grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3), has_aux=True)(*args)

        np.testing.assert_allclose(
            np.asarray(d_j).transpose(0, 3, 1, 2), d_ref.detach().numpy(),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(s_j).transpose(0, 3, 1, 2), s_ref.detach().numpy(),
            rtol=1e-4, atol=1e-5,
        )
        ref_grads = [a_t.grad, n_t.grad, r_t.grad]
        for g_j, g_t in zip(grads[:3], ref_grads):
            np.testing.assert_allclose(
                np.asarray(g_j).transpose(0, 3, 1, 2),
                g_t.numpy(),
                rtol=2e-3, atol=2e-4,
            )
        g_env = np.asarray(grads[3]).reshape(b, hh, ww, 8, 16, 3).transpose(0, 5, 1, 2, 3, 4)
        np.testing.assert_allclose(
            g_env, e_t.grad.numpy(), rtol=2e-3, atol=2e-5
        )

    def test_ls_regress_allclose(self, torch_ref):
        torch, ref_models = torch_ref
        rng = np.random.default_rng(6)
        pred = rng.uniform(0, 1, (3, 5, 7, 2)).astype(np.float32)
        gt = rng.uniform(0, 1, (3, 5, 7, 2)).astype(np.float32)
        out_ref = ref_models.LSregress(
            torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(pred)
        ).numpy()
        out_j = scale.ls_regress(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(pred)
        )
        np.testing.assert_allclose(np.asarray(out_j), out_ref, rtol=1e-6)

    def test_ls_regress_diff_spec_allclose(self, torch_ref):
        torch, ref_models = torch_ref
        rng = np.random.default_rng(7)
        b, c, hh, ww = 2, 3, 8, 9
        diff = rng.uniform(0, 0.8, (b, hh, ww, c)).astype(np.float32)
        spec = rng.uniform(0, 0.4, (b, hh, ww, c)).astype(np.float32)
        im = rng.uniform(0, 1.2, (b, hh, ww, c)).astype(np.float32)

        def t(x):
            return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

        d_ref, s_ref = ref_models.LSregressDiffSpec(
            t(diff), t(spec), t(im), t(diff), t(spec)
        )
        d_j, s_j = scale.ls_regress_diff_spec(
            jnp.asarray(diff), jnp.asarray(spec), jnp.asarray(im),
            jnp.asarray(diff), jnp.asarray(spec),
        )
        np.testing.assert_allclose(
            np.asarray(d_j).transpose(0, 3, 1, 2), d_ref.numpy(), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s_j).transpose(0, 3, 1, 2), s_ref.numpy(), rtol=1e-4, atol=1e-6
        )


class TestRenderLayerAPI:
    def test_pooling_path(self):
        rng = np.random.default_rng(8)
        albedo, normal, rough, _ = _rand_brdf(rng, b=1, h=8, w=12, d=1)
        envmap = rng.uniform(0, 1, (1, 4, 6, 128, 3))
        layer = RenderLayer(env_rows=4, env_cols=6)
        d, s = layer.forward_env(
            jnp.asarray(albedo), jnp.asarray(normal), jnp.asarray(rough),
            jnp.asarray(envmap),
        )
        assert d.shape == (1, 4, 6, 3)
        assert s.shape == (1, 4, 6, 3)
        # exact 2x2 pooling equivalence
        a2 = albedo.reshape(1, 4, 2, 6, 2, 3).mean(axis=(2, 4))
        n2 = normal.reshape(1, 4, 2, 6, 2, 3).mean(axis=(2, 4))
        r2 = rough.reshape(1, 4, 2, 6, 2, 1).mean(axis=(2, 4))
        dn, sn = onp.render_envmap_np(a2, n2, r2, envmap)
        np.testing.assert_allclose(np.asarray(d), dn, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(s), sn, rtol=1e-8, atol=1e-10)
