"""End-to-end loss parity: our brdf_step vs the reference wrapperBRDF.

Transfers the same random torch weights into both stacks, feeds the same
batch, and compares the four masked training losses. This is the
strongest train-parity check: it exercises networks, LSregress coupling,
masking, and normalization together.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import os
import sys

if not os.path.isdir("/root/reference"):
    pytest.skip("reference not mounted", allow_module_level=True)
sys.path.insert(0, "/root/reference")


class _Opt:
    cascadeLevel = 0


def _patch_cuda():
    orig = {}
    for cls in (torch.Tensor, torch.nn.Module):
        orig[cls] = cls.cuda
        cls.cuda = lambda self, *a, **k: self
    return orig


def _unpatch(orig):
    for cls, fn in orig.items():
        cls.cuda = fn


def test_brdf_losses_match_reference_wrapper():
    import models as ref_models
    import wrapperBRDF as ref_wrapper

    from inverserenderingofindoorscene_tpu.pipeline.brdf import (
        BRDFNets,
        brdf_step,
    )
    from inverserenderingofindoorscene_tpu.utils import torch_import as ti

    torch.manual_seed(7)
    h, w, b = 64, 64, 2
    tenc = ref_models.encoder0(cascadeLevel=0).eval()
    tdecs = [ref_models.decoder0(mode=m).eval() for m in (0, 1, 2, 4)]

    rng = np.random.RandomState(7)
    im = rng.rand(b, h, w, 3).astype(np.float32)
    albedo = rng.rand(b, h, w, 3).astype(np.float32)
    normal = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    normal[..., 2] = np.abs(normal[..., 2]) + 0.3
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    rough = rng.uniform(-1, 1, (b, h, w, 1)).astype(np.float32)
    depth = (rng.rand(b, h, w, 1) * 4 + 0.2).astype(np.float32)
    seg_m = np.kron(rng.rand(b, h // 8, w // 8),
                    np.ones((8, 8)))[..., None]
    seg_area = (seg_m > 0.8).astype(np.float32)
    seg_obj = (seg_m < 0.6).astype(np.float32)
    seg_env = ((seg_m >= 0.6) & (seg_m <= 0.8)).astype(np.float32)

    # --- reference side (NCHW, cuda patched out) ---
    orig = _patch_cuda()
    try:
        t = lambda x: torch.from_numpy(  # noqa: E731
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))
        )
        data_batch = {
            "im": t(im),
            "albedo": t(albedo),
            "normal": t(normal),
            "rough": t(rough),
            "depth": t(depth),
            "segArea": t(seg_area),
            "segEnv": t(seg_env),
            "segObj": t(seg_obj),
        }
        with torch.no_grad():
            pairs = ref_wrapper.wrapperBRDF(
                data_batch, _Opt(), tenc, *tdecs
            )
        ref_errors = {
            name: float(pair[1])
            for name, pair in zip(
                ("albedo", "normal", "rough", "depth"), pairs
            )
        }
    finally:
        _unpatch(orig)

    # --- our side (same weights via torch_import) ---
    sd = lambda m: {k: v.numpy() for k, v in m.state_dict().items()}  # noqa: E731
    params = ti.brdf_params_from_torch(
        sd(tenc), sd(tdecs[0]), sd(tdecs[1]), sd(tdecs[2]), sd(tdecs[3])
    )
    nets = BRDFNets(cascade_level=0)
    batch = {
        "im": jnp.asarray(im),
        "albedo": jnp.asarray(albedo),
        "normal": jnp.asarray(normal),
        "rough": jnp.asarray(rough),
        "depth": jnp.asarray(depth),
        "seg_brdf": jnp.asarray(seg_obj),
        "seg_all": jnp.asarray(seg_area + seg_obj),
    }
    _, errors = jax.jit(lambda p, bt: brdf_step(nets, p, bt))(params, batch)

    for k in ("albedo", "normal", "rough", "depth"):
        np.testing.assert_allclose(
            float(errors[k]), ref_errors[k], rtol=2e-3, err_msg=k
        )


def test_cascade1_brdf_losses_match_reference_wrapper():
    """Cascade-1: 17-ch input assembly (Pre upsampling, LSregressDiffSpec
    re-fit, mean normalization) + losses vs wrapperBRDF(cascadeLevel=1)."""
    import models as ref_models
    import wrapperBRDF as ref_wrapper

    from inverserenderingofindoorscene_tpu.pipeline.brdf import (
        BRDFNets,
        brdf_step,
    )
    from inverserenderingofindoorscene_tpu.utils import torch_import as ti

    class _Opt1:
        cascadeLevel = 1
        imHeight, imWidth = 64, 64

    torch.manual_seed(13)
    h, w, b = 64, 64, 2
    r, c = 32, 32  # lighting-grid res of the Pre products
    tenc = ref_models.encoder0(cascadeLevel=1).eval()
    tdecs = [ref_models.decoder0(mode=m).eval() for m in (0, 1, 2, 4)]

    rng = np.random.RandomState(13)

    def mk(shape, lo=0.0, hi=1.0):
        return rng.uniform(lo, hi, shape).astype(np.float32)

    im = mk((b, h, w, 3))
    albedo = mk((b, h, w, 3))
    normal = mk((b, h, w, 3), -1, 1)
    normal[..., 2] = np.abs(normal[..., 2]) + 0.3
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    rough = mk((b, h, w, 1), -1, 1)
    depth = mk((b, h, w, 1), 0.2, 4.0)
    seg_m = np.kron(rng.rand(b, h // 8, w // 8), np.ones((8, 8)))[..., None]
    seg_area = (seg_m > 0.8).astype(np.float32)
    seg_obj = (seg_m < 0.6).astype(np.float32)
    seg_env = ((seg_m >= 0.6) & (seg_m <= 0.8)).astype(np.float32)

    # Pre products as the loader provides them (already normalized:
    # dataLoader.py:162-184 — albedo/depth mean 1/3, normal in [0,1],
    # rough in [0,1], diffuse/specular max-normalized)
    albedo_pre = mk((b, r, c, 3))
    albedo_pre = albedo_pre / albedo_pre.mean(axis=(1, 2, 3), keepdims=True) / 3
    normal_pre = mk((b, r, c, 3))
    rough_pre = mk((b, r, c, 1))
    depth_pre = mk((b, r, c, 1), 0.1, 2.0)
    depth_pre = depth_pre / depth_pre.mean(axis=(1, 2, 3), keepdims=True) / 3
    diffuse_pre = mk((b, r, c, 3))
    specular_pre = mk((b, r, c, 3), 0.0, 0.5)

    orig = _patch_cuda()
    try:
        t = lambda x: torch.from_numpy(  # noqa: E731
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))
        )
        data_batch = {
            "im": t(im), "albedo": t(albedo), "normal": t(normal),
            "rough": t(rough), "depth": t(depth),
            "segArea": t(seg_area), "segEnv": t(seg_env),
            "segObj": t(seg_obj),
            "albedoPre": t(albedo_pre), "normalPre": t(normal_pre),
            "roughPre": t(rough_pre), "depthPre": t(depth_pre),
            "diffusePre": t(diffuse_pre), "specularPre": t(specular_pre),
            # required key at cascade>0 (unused by the BRDF losses)
            "envmapsPre": torch.zeros(b, 84, r, c),
        }
        with torch.no_grad():
            pairs = ref_wrapper.wrapperBRDF(data_batch, _Opt1(), tenc, *tdecs)
        ref_errors = {
            nm: float(p[1])
            for nm, p in zip(("albedo", "normal", "rough", "depth"), pairs)
        }
    finally:
        _unpatch(orig)

    sd = lambda m: {k: v.numpy() for k, v in m.state_dict().items()}  # noqa: E731
    params = ti.brdf_params_from_torch(
        sd(tenc), sd(tdecs[0]), sd(tdecs[1]), sd(tdecs[2]), sd(tdecs[3])
    )
    nets = BRDFNets(cascade_level=1)
    batch = {
        "im": jnp.asarray(im), "albedo": jnp.asarray(albedo),
        "normal": jnp.asarray(normal), "rough": jnp.asarray(rough),
        "depth": jnp.asarray(depth), "seg_brdf": jnp.asarray(seg_obj),
        "seg_all": jnp.asarray(seg_area + seg_obj),
        "albedo_pre": jnp.asarray(albedo_pre),
        "normal_pre": jnp.asarray(normal_pre),
        "rough_pre": jnp.asarray(rough_pre),
        "depth_pre": jnp.asarray(depth_pre),
        "diffuse_pre": jnp.asarray(diffuse_pre),
        "specular_pre": jnp.asarray(specular_pre),
    }
    _, errors = jax.jit(lambda p, bt: brdf_step(nets, p, bt))(params, batch)

    for k in ("albedo", "normal", "rough", "depth"):
        np.testing.assert_allclose(
            float(errors[k]), ref_errors[k], rtol=5e-3, err_msg=k
        )
