"""Import reference-trained torch checkpoints into this framework.

The reference ships trained `.pth` modules (whole-module torch.save,
trainBRDF.py:392-396). These converters map their state dicts onto our
flax param trees (conv OIHW -> HWIO; GroupNorm weight/bias -> scale/bias)
so users of the reference can bring trained weights directly. The layer
mappings are validated by tests/test_weight_parity.py (forward outputs
allclose with transferred weights).

Input is a ``{name: numpy array}`` state dict — load with
``{k: v.numpy() for k, v in torch.load(p, map_location='cpu').state_dict().items()}``
(torch only needed at conversion time).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _conv(sd, name):
    return {
        "kernel": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))),
        "bias": jnp.asarray(sd[f"{name}.bias"]),
    }


def _gn(sd, name):
    return {
        "scale": jnp.asarray(sd[f"{name}.weight"]),
        "bias": jnp.asarray(sd[f"{name}.bias"]),
    }


def encoder_params(sd) -> dict:
    """reference ``encoder0`` state dict -> flax Encoder params."""
    p = {}
    for i in range(6):
        p[f"Conv_{i}"] = _conv(sd, f"conv{i+1}")
        p[f"GroupNorm_{i}"] = _gn(sd, f"gn{i+1}")
    return {"params": p}


def decoder_params(sd) -> dict:
    """reference ``decoder0`` state dict -> flax Decoder params."""
    p = {}
    for i in range(6):
        p[f"Conv_{i}"] = _conv(sd, f"dconv{i+1}")
        p[f"GroupNorm_{i}"] = _gn(sd, f"dgn{i+1}")
    p["Conv_6"] = _conv(sd, "dconvFinal")
    return {"params": p}


def light_encoder_params(sd) -> dict:
    """reference ``encoderLight`` state dict -> flax LightEncoder params."""
    p = {
        "Conv_0": _conv(sd, "preProcess.1"),
        "GroupNorm_0": _gn(sd, "preProcess.2"),
        "Conv_1": _conv(sd, "preProcess.5"),
        "GroupNorm_1": _gn(sd, "preProcess.6"),
    }
    for i in range(6):
        p[f"Conv_{i+2}"] = _conv(sd, f"conv{i+1}")
        p[f"GroupNorm_{i+2}"] = _gn(sd, f"gn{i+1}")
    return {"params": p}


def light_decoder_params(sd) -> dict:
    """reference ``decoderLight`` state dict -> flax LightDecoder params."""
    p = {}
    for i in range(6):
        p[f"Conv_{i}"] = _conv(sd, f"dconv{i+1}")
        p[f"GroupNorm_{i}"] = _gn(sd, f"dgn{i+1}")
    p["Conv_6"] = _conv(sd, "dconvFinal")
    return {"params": p}


def confidence_params(sd) -> dict:
    """reference ``BilateralLayer`` CNN state dict -> ConfidenceNet params."""
    return {
        "params": {
            "Conv_0": _conv(sd, "conv1"),
            "GroupNorm_0": _gn(sd, "gn1"),
            "Conv_1": _conv(sd, "conv2"),
            "GroupNorm_1": _gn(sd, "gn2"),
            "Conv_2": _conv(sd, "dconv1"),
            "GroupNorm_2": _gn(sd, "dgn1"),
            "Conv_3": _conv(sd, "dconv2"),
            "GroupNorm_3": _gn(sd, "dgn2"),
            "Conv_4": _conv(sd, "dconvFinal"),
        }
    }


def brdf_params_from_torch(encoder_sd, albedo_sd, normal_sd, rough_sd,
                           depth_sd) -> dict:
    """Assemble the BRDFNets params pytree from five reference state dicts."""
    return {
        "encoder": encoder_params(encoder_sd),
        "albedo": decoder_params(albedo_sd),
        "normal": decoder_params(normal_sd),
        "rough": decoder_params(rough_sd),
        "depth": decoder_params(depth_sd),
    }


def light_params_from_torch(encoder_sd, axis_sd, lamb_sd, weight_sd) -> dict:
    """Assemble the LightNets params pytree from four reference state dicts."""
    return {
        "encoder": light_encoder_params(encoder_sd),
        "axis": light_decoder_params(axis_sd),
        "lamb": light_decoder_params(lamb_sd),
        "weight": light_decoder_params(weight_sd),
    }
