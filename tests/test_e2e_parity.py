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
