"""Lighting step composition (the wrapperBRDFLight equivalent).

Pure-functional counterpart of /root/reference/wrapperBRDFLight.py:8-223:
runs the (frozen) BRDF stack, assembles the 11-channel 480x640 light-encoder
input, decodes the per-pixel SG lighting, reconstructs the envmaps and the
physically rendered image, and computes the reconstruction + render losses.
The SG->envmap evaluation and the shading integral go through
``core.sg``/``core.render_layer`` (Pallas fast path on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core import sg
from inverserenderingofindoorscene_tpu.core.imageops import (
    adaptive_avg_pool,
    resize_bilinear,
)
from inverserenderingofindoorscene_tpu.core.render_layer import RenderLayer
from inverserenderingofindoorscene_tpu.losses.masked import (
    envmap_reconst_error,
    render_error,
)
from inverserenderingofindoorscene_tpu.models.lightnet import (
    LightDecoder,
    LightEncoder,
)
from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets, brdf_forward


@dataclasses.dataclass(frozen=True, kw_only=True)
class LightNets:
    sg_num: int = 12
    cascade_level: int = 0
    env_rows: int = 120
    env_cols: int = 160
    env_height: int = 8
    env_width: int = 16
    compute_dtype: str = "float32"

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def light_hw(self):
        """Light-encoder input size: 4x the lighting grid (480x640 at the
        reference operating point, wrapperBRDFLight.py:149)."""
        return (self.env_rows * 4, self.env_cols * 4)

    @property
    def encoder(self) -> LightEncoder:
        return LightEncoder(
            sg_num=self.sg_num, cascade_level=self.cascade_level,
            dtype=self._dtype,
        )

    @property
    def decoders(self):
        return {
            "axis": LightDecoder(sg_num=self.sg_num, mode=0, dtype=self._dtype),
            "lamb": LightDecoder(sg_num=self.sg_num, mode=1, dtype=self._dtype),
            "weight": LightDecoder(sg_num=self.sg_num, mode=2, dtype=self._dtype),
        }

    def init(self, rng, light_hw=None):
        h, w = light_hw if light_hw is not None else self.light_hw

        def _init(rng):
            x = jnp.zeros((1, h, w, 11), jnp.float32)
            env_pre = (
                jnp.zeros(
                    (1, self.env_rows, self.env_cols, self.sg_num * 7),
                    jnp.float32,
                )
                if self.cascade_level > 0
                else None
            )
            ks = jax.random.split(rng, 4)
            enc = self.encoder.init(ks[0], x, env_pre)
            feats = self.encoder.apply(enc, x, env_pre)
            params = {"encoder": enc}
            for k, (name, dec) in zip(ks[1:], self.decoders.items()):
                params[name] = dec.init(
                    k, feats, (self.env_rows, self.env_cols)
                )
            return params

        # jit: eager per-op dispatch during init is very slow on TPU.
        return jax.jit(_init)(rng)


def mean_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """x / max(mean(x), 1e-10) / 3 per batch element (wrapperBRDFLight.py:139-147)."""
    b = x.shape[0]
    m = jnp.clip(jnp.mean(x.reshape(b, -1), axis=1), 1e-10, None)
    return x / m.reshape(b, 1, 1, 1) / 3.0


def light_input_from_preds(
    im: jnp.ndarray, preds: dict, light_hw=(480, 640), dtype=None
) -> jnp.ndarray:
    """The 11-channel light-encoder input (wrapperBRDFLight.py:149-157).

    preds' albedo/depth must already be mean-normalized; normal and rough
    are shifted to [0,1] and everything is bilinearly upsampled to
    light_hw.  The five source maps are concatenated at image resolution
    and upsampled with ONE 11-channel resize — bilinear interpolation is
    affine and channelwise, so this equals the reference's five separate
    upsamples up to float rounding, with a single layout transition
    instead of five.  ``dtype``: optional cast applied BEFORE the resize
    so a bf16 encoder gets a bf16 assembly (the input is stop-gradiented;
    the f32 preds still feed the loss paths unchanged).
    """
    stacked = jnp.concatenate(
        [
            im,
            preds["albedo"],
            0.5 * (preds["normal"] + 1.0),
            0.5 * (preds["rough"] + 1.0),
            preds["depth"],
        ],
        axis=-1,
    )
    if dtype is not None:
        stacked = stacked.astype(dtype)
    return resize_bilinear(stacked, light_hw)


def light_forward(
    nets: LightNets,
    params: dict,
    im: jnp.ndarray,
    brdf_preds: dict,
    env_pre: Optional[jnp.ndarray] = None,
):
    """Light encoder + 3 SG decoders.

    Returns dict with axis [B,R,C,sg,3], lamb01 [B,R,C,sg], weight01
    [B,R,C,sg,3] and the flat ``sg_flat`` [B,R,C,sg*7] cascade tensor
    ([axis|lamb|weight] layout of wrapperBRDFLight.py:167-168).
    The 11-ch input (and env_pre) are stop-gradiented exactly like the
    reference's ``inputBatch.detach()`` (wrapperBRDFLight.py:159-161).
    """
    inp = jax.lax.stop_gradient(
        light_input_from_preds(
            im, brdf_preds, nets.light_hw,
            # bf16 mode: assemble + resize in bf16 (the encoder casts to
            # bf16 at entry anyway; doing it before the upsample halves
            # the assembly's bytes and kills the f32->bf16 convert chain)
            dtype=None if nets.compute_dtype == "float32" else nets._dtype,
        )
    )
    if nets.cascade_level > 0:
        assert env_pre is not None
        env_pre = jax.lax.stop_gradient(env_pre)
    feats = nets.encoder.apply(params["encoder"], inp, env_pre)
    env_hw = (nets.env_rows, nets.env_cols)
    decs = nets.decoders
    axis = decs["axis"].apply(params["axis"], feats, env_hw)
    lamb01 = decs["lamb"].apply(params["lamb"], feats, env_hw)
    weight01 = decs["weight"].apply(params["weight"], feats, env_hw)
    b, r, c = axis.shape[:3]
    sg_flat = jnp.concatenate(
        [
            axis.reshape(b, r, c, -1),
            lamb01,
            weight01.reshape(b, r, c, -1),
        ],
        axis=-1,
    )
    return {"axis": axis, "lamb01": lamb01, "weight01": weight01, "sg_flat": sg_flat}


def light_step(
    brdf_nets: BRDFNets,
    light_nets: LightNets,
    brdf_params: dict,
    light_params: dict,
    batch: dict,
    offset: float = 1.0,
    axis_name: Optional[str] = None,
    use_pallas: bool = False,
):
    """Full BRDF+Light forward + losses (wrapperBRDFLight.py:8-223).

    batch keys: im/albedo/normal/rough/depth/seg_brdf/seg_all (image res),
    env_gt [B,R,C,D,3], env_ind [B,1] validity, plus cascade-1 ``*_pre``
    keys when cascade_level > 0.

    Returns (losses dict, aux dict).  BRDF errors are reported but the
    reference's trainLight only backprops reconst+render (the BRDF nets are
    frozen there; freezing is the caller's choice of which params to
    optimize).
    """
    from inverserenderingofindoorscene_tpu.losses.masked import brdf_errors

    im = batch["im"]
    preds = brdf_forward(brdf_nets, brdf_params, batch)
    errors, _ = brdf_errors(
        preds["albedo"], preds["normal"], preds["rough"], preds["depth"],
        batch, axis_name=axis_name,
    )

    preds = dict(preds)
    preds["albedo"] = mean_normalize(preds["albedo"])
    preds["depth"] = mean_normalize(preds["depth"])

    env_pre = batch.get("env_pre") if light_nets.cascade_level > 0 else None
    sg_out = light_forward(light_nets, light_params, im, preds, env_pre)

    r, c = light_nets.env_rows, light_nets.env_cols
    im_small = adaptive_avg_pool(im, (r, c))
    seg_small = adaptive_avg_pool(batch["seg_brdf"], (r, c))

    env_gt = batch["env_gt"]  # [B,R,C,D,3]
    not_dark = (jnp.mean(env_gt, axis=(-2, -1), keepdims=False)[..., None] > 0.001)
    env_ind = batch["env_ind"].reshape(-1, 1, 1, 1)  # [B,1,1,1]
    seg_env = seg_small * env_ind * not_dark.astype(im.dtype)  # [B,R,C,1]

    lamb = sg.unsquash(sg_out["lamb01"])
    weight = sg.unsquash(sg_out["weight01"])
    if use_pallas:
        from inverserenderingofindoorscene_tpu.ops.sg_render import sg_envmap

        env_pred = sg_envmap(
            sg_out["axis"], lamb, weight,
            light_nets.env_height, light_nets.env_width,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        env_pred = sg.sg_to_envmap(
            sg_out["axis"], lamb, weight,
            light_nets.env_height, light_nets.env_width,
        )

    reconst_err, env_scaled = envmap_reconst_error(
        env_pred, env_gt, seg_env, offset, axis_name
    )

    if use_pallas:
        # Fused path: evaluate SG + shade in ONE Pallas kernel; the decoded
        # env_pred above is only needed for the reconstruction loss, the
        # render loss never materializes per-direction tensors in HBM.
        from inverserenderingofindoorscene_tpu.ops.sg_render import render_sg

        diffuse, specular = render_sg(
            adaptive_avg_pool(jax.lax.stop_gradient(preds["albedo"]), (r, c)),
            adaptive_avg_pool(preds["normal"], (r, c)),
            adaptive_avg_pool(preds["rough"], (r, c)),
            sg_out["axis"],
            lamb,
            weight,
            env_height=light_nets.env_height,
            env_width=light_nets.env_width,
            # Mosaic compilation needs a TPU; fall back to the Pallas
            # interpreter elsewhere (CPU tests / virtual meshes).
            interpret=jax.default_backend() != "tpu",
        )
    else:
        layer = RenderLayer(
            env_rows=r,
            env_cols=c,
            env_height=light_nets.env_height,
            env_width=light_nets.env_width,
        )
        diffuse, specular = layer.forward_env(
            jax.lax.stop_gradient(preds["albedo"]),
            preds["normal"],
            preds["rough"],
            env_pred,
        )
    render_err, rendered = render_error(
        diffuse, specular, im_small, seg_small, axis_name
    )

    losses = dict(errors)
    losses["reconst"] = reconst_err
    losses["render"] = render_err
    aux = {
        "brdf_preds": preds,
        "sg": sg_out,
        "env_pred": env_pred,
        "env_scaled": env_scaled,
        "diffuse": diffuse,
        "specular": specular,
        "rendered": rendered,
    }
    return losses, aux
