"""Weight-transfer forward parity vs the torch reference.

Random-initializes the reference torch modules, copies the weights into
the flax models (OIHW -> HWIO), and checks the outputs agree on the same
input. This pins layer semantics (padding, GroupNorm, interpolation,
heads) — shape/param-count parity alone can't catch a swapped pad mode.
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

import models as ref_models  # noqa: E402

from inverserenderingofindoorscene_tpu.models.mgnet import (  # noqa: E402
    Decoder,
    Encoder,
)

H, W = 64, 64


def t2j_conv(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def t2j(x):
    return jnp.asarray(x.detach().numpy())


def copy_encoder_params(tenc, jparams):
    p = dict(jparams["params"])
    for i in range(6):
        conv = getattr(tenc, f"conv{i+1}")
        gn = getattr(tenc, f"gn{i+1}")
        p[f"Conv_{i}"] = {"kernel": t2j_conv(conv.weight), "bias": t2j(conv.bias)}
        p[f"GroupNorm_{i}"] = {"scale": t2j(gn.weight), "bias": t2j(gn.bias)}
    return {"params": p}


def copy_decoder_params(tdec, jparams):
    p = dict(jparams["params"])
    for i in range(6):
        conv = getattr(tdec, f"dconv{i+1}")
        gn = getattr(tdec, f"dgn{i+1}")
        p[f"Conv_{i}"] = {"kernel": t2j_conv(conv.weight), "bias": t2j(conv.bias)}
        p[f"GroupNorm_{i}"] = {"scale": t2j(gn.weight), "bias": t2j(gn.bias)}
    p["Conv_6"] = {
        "kernel": t2j_conv(tdec.dconvFinal.weight),
        "bias": t2j(tdec.dconvFinal.bias),
    }
    return {"params": p}


@pytest.fixture(scope="module")
def torch_stack():
    torch.manual_seed(0)
    tenc = ref_models.encoder0(cascadeLevel=0).eval()
    tdecs = {m: ref_models.decoder0(mode=m).eval() for m in (0, 1, 2, 4)}
    return tenc, tdecs


def test_encoder_forward_parity(torch_stack):
    tenc, _ = torch_stack
    rng = np.random.RandomState(0)
    x = rng.rand(1, H, W, 3).astype(np.float32)

    enc = Encoder(in_channels=3)
    jp = enc.init(jax.random.key(0), jnp.asarray(x))
    jp = copy_encoder_params(tenc, jp)
    feats_j = enc.apply(jp, jnp.asarray(x))

    with torch.no_grad():
        feats_t = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    for i, (fj, ft) in enumerate(zip(feats_j, feats_t)):
        ft = ft.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(fj), ft, atol=2e-4, err_msg=f"x{i+1}"
        )


@pytest.mark.parametrize("mode", [0, 1, 2, 4])
def test_decoder_forward_parity(torch_stack, mode):
    tenc, tdecs = torch_stack
    rng = np.random.RandomState(1)
    x = rng.rand(1, H, W, 3).astype(np.float32)

    enc = Encoder(in_channels=3)
    jp = copy_encoder_params(tenc, enc.init(jax.random.key(0), jnp.asarray(x)))
    feats_j = enc.apply(jp, jnp.asarray(x))

    dec = Decoder(mode=mode)
    dp = dec.init(jax.random.key(1), jnp.asarray(x), feats_j)
    dp = copy_decoder_params(tdecs[mode], dp)
    out_j = np.asarray(dec.apply(dp, jnp.asarray(x), feats_j))

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        feats_t = tenc(xt)
        out_t = tdecs[mode](xt, *feats_t).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(out_j, out_t, atol=1e-3)


from inverserenderingofindoorscene_tpu.models.lightnet import (  # noqa: E402
    LightDecoder,
    LightEncoder,
)

LH, LW = 128, 128  # light input; env grid = LH/4 x LW/4


def copy_light_encoder_params(tenc, jparams):
    p = dict(jparams["params"])
    # preProcess Sequential: conv at [1], gn at [2]; conv at [5], gn at [6]
    p["Conv_0"] = {
        "kernel": t2j_conv(tenc.preProcess[1].weight),
        "bias": t2j(tenc.preProcess[1].bias),
    }
    p["GroupNorm_0"] = {
        "scale": t2j(tenc.preProcess[2].weight),
        "bias": t2j(tenc.preProcess[2].bias),
    }
    p["Conv_1"] = {
        "kernel": t2j_conv(tenc.preProcess[5].weight),
        "bias": t2j(tenc.preProcess[5].bias),
    }
    p["GroupNorm_1"] = {
        "scale": t2j(tenc.preProcess[6].weight),
        "bias": t2j(tenc.preProcess[6].bias),
    }
    for i in range(6):
        conv = getattr(tenc, f"conv{i+1}")
        gn = getattr(tenc, f"gn{i+1}")
        p[f"Conv_{i+2}"] = {
            "kernel": t2j_conv(conv.weight), "bias": t2j(conv.bias)
        }
        p[f"GroupNorm_{i+2}"] = {
            "scale": t2j(gn.weight), "bias": t2j(gn.bias)
        }
    return {"params": p}


def copy_light_decoder_params(tdec, jparams):
    p = dict(jparams["params"])
    for i in range(6):
        conv = getattr(tdec, f"dconv{i+1}")
        gn = getattr(tdec, f"dgn{i+1}")
        p[f"Conv_{i}"] = {"kernel": t2j_conv(conv.weight), "bias": t2j(conv.bias)}
        p[f"GroupNorm_{i}"] = {"scale": t2j(gn.weight), "bias": t2j(gn.bias)}
    p["Conv_6"] = {
        "kernel": t2j_conv(tdec.dconvFinal.weight),
        "bias": t2j(tdec.dconvFinal.bias),
    }
    return {"params": p}


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_light_stack_forward_parity(mode):
    torch.manual_seed(2)
    tenc = ref_models.encoderLight(SGNum=12, cascadeLevel=0).eval()
    tdec = ref_models.decoderLight(SGNum=12, mode=mode).eval()
    rng = np.random.RandomState(2)
    x = rng.rand(1, LH, LW, 11).astype(np.float32)
    er, ec = LH // 4, LW // 4

    enc = LightEncoder(sg_num=12, cascade_level=0)
    jp = copy_light_encoder_params(
        tenc, enc.init(jax.random.key(0), jnp.asarray(x), None)
    )
    feats_j = enc.apply(jp, jnp.asarray(x), None)

    dec = LightDecoder(sg_num=12, mode=mode)
    dp = copy_light_decoder_params(
        tdec, dec.init(jax.random.key(1), feats_j, (er, ec))
    )
    out_j = np.asarray(dec.apply(dp, feats_j, (er, ec)))

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        feats_t = tenc(xt)
        env_hint = torch.zeros(1, 3, er, ec)
        out_t = tdec(*feats_t, env_hint).numpy()

    if mode == 0:
        # torch [1, SG, 3, R, C] -> ours [1, R, C, SG, 3]
        out_t = out_t.transpose(0, 3, 4, 1, 2)
    elif mode == 2:
        out_t = out_t.transpose(0, 2, 3, 1)  # [1,R,C,3*SG]
        out_t = out_t.reshape(out_t.shape[0], out_t.shape[1],
                              out_t.shape[2], 12, 3)
    else:
        out_t = out_t.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out_j, out_t, atol=1e-3)


from inverserenderingofindoorscene_tpu.models.bilateral_net import (  # noqa: E402
    ConfidenceNet,
)


def test_confidence_cnn_forward_parity():
    """ConfidenceNet vs the reference BilateralLayer CNN (conf head only),
    weights transferred via utils.torch_import.confidence_params."""
    sys.path.insert(0, "/root/reference")
    # BilateralLayer.py imports torchvision (unused by the CNN) — stub it
    import types

    for mod in ("torchvision", "torchvision.transforms"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"
    ]
    sys.modules["torchvision"].datasets = types.ModuleType("datasets")
    import BilateralLayer as ref_bl

    from inverserenderingofindoorscene_tpu.utils import torch_import as ti

    torch.manual_seed(17)
    tbl = ref_bl.BilateralLayer(mode=0, isCuda=False).eval()
    sd = {k: v.numpy() for k, v in tbl.state_dict().items()}
    jp = ti.confidence_params(sd)

    rng = np.random.RandomState(17)
    im = rng.rand(1, H, W, 3).astype(np.float32) * 0.8
    pred = rng.rand(1, H, W, 3).astype(np.float32)

    out_j = np.asarray(ConfidenceNet(in_channels=6).apply(
        jp, jnp.asarray(im), jnp.asarray(pred)
    ))

    # reference conf path (BilateralLayer.forward up to `conf`,
    # BilateralLayer.py:242-270) without invoking the solver
    with torch.no_grad():
        timg = torch.from_numpy(im.transpose(0, 3, 1, 2))
        tpred = torch.from_numpy(pred.transpose(0, 3, 1, 2))
        scale = timg.amax(dim=(1, 2, 3), keepdim=True).clamp(1e-5, 1)
        timg_n = timg / scale
        x = torch.cat([timg_n, tpred], dim=1)
        import torch.nn.functional as F

        x1 = F.relu(tbl.gn1(tbl.conv1(tbl.pad1(x))), True)
        x2 = F.relu(tbl.gn2(tbl.conv2(tbl.pad2(x1))), True)
        dx1 = F.relu(tbl.dgn1(tbl.dconv1(x2)), True)
        dx1 = F.interpolate(dx1, [x1.size(2), x1.size(3)], mode="bilinear")
        dx2 = F.relu(tbl.dgn2(tbl.dconv2(torch.cat([dx1, x1], dim=1))), True)
        dx2 = F.interpolate(dx2, [x.size(2), x.size(3)], mode="bilinear")
        conf = 0.5 * (torch.tanh(tbl.dconvFinal(tbl.dpad3(dx2))) + 1)
        conf = conf / torch.clamp(conf.max(), min=1e-5)
    out_t = conf.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out_j, out_t, atol=2e-4)
