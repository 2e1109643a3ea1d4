"""Cascade BRDF step composition (the wrapperBRDF equivalent).

Pure-functional counterpart of /root/reference/wrapperBRDF.py:8-134: given
module definitions + a params pytree + an NHWC batch, runs the encoder and
the four decoder heads, applies the LSregress scale fits and returns
predictions + the masked errors.  No device staging — batches are already
jax arrays and the whole step jits as one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core.imageops import (
    adaptive_avg_pool,
    resize_bilinear,
)
from inverserenderingofindoorscene_tpu.core.scale import ls_regress_diff_spec
from inverserenderingofindoorscene_tpu.losses.masked import brdf_errors
from inverserenderingofindoorscene_tpu.models.mgnet import (
    Decoder,
    DecoderTrunk,
    Encoder,
    apply_head,
)


@dataclasses.dataclass(frozen=True)
class BRDFNets:
    """Module bundle for one cascade level.

    ``compute_dtype``: "float32" or "bfloat16" — bf16 runs the conv
    stacks on the MXU fast path (params and heads stay f32)."""

    cascade_level: int = 0
    compute_dtype: str = "float32"
    # Run the four shape-identical decoder trunks as one vmapped (grouped-
    # conv) computation instead of four sequential stacks.  Numerically
    # equivalent (same ops, different grouping; parity test in
    # tests/test_pipeline.py).  Default OFF: measured on v5e the grouped
    # convs XLA derives from the vmap lower WORSE than four sequential
    # stacks (121.5 vs 113.6 ms/step bf16 at B16 240x320 —
    # scripts/ab_fused_decoders.py), so this stays an ablation knob.
    fuse_decoders: bool = False

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def encoder(self) -> Encoder:
        return Encoder(
            in_channels=3 if self.cascade_level == 0 else 17,
            dtype=self._dtype,
        )

    @property
    def decoders(self):
        # albedo / normal / rough / depth heads (modes 0/1/2/4)
        return {
            "albedo": Decoder(mode=0, dtype=self._dtype),
            "normal": Decoder(mode=1, dtype=self._dtype),
            "rough": Decoder(mode=2, dtype=self._dtype),
            "depth": Decoder(mode=4, dtype=self._dtype),
        }

    def init(self, rng, im_hw=(240, 320)):
        """Initialize the params pytree for encoder + 4 decoders.

        Runs under jit: eager per-op dispatch during flax init is very slow
        on TPU backends, one compile per op."""
        h, w = im_hw
        in_ch = 3 if self.cascade_level == 0 else 17

        def _init(rng):
            x = jnp.zeros((1, h, w, in_ch), jnp.float32)
            im = x[..., :3]
            ks = jax.random.split(rng, 5)
            enc = self.encoder.init(ks[0], x)
            feats = self.encoder.apply(enc, x)
            params = {"encoder": enc}
            for k, (name, dec) in zip(ks[1:], self.decoders.items()):
                params[name] = dec.init(k, im, feats)
            return params

        return jax.jit(_init)(rng)


def prepare_cascade_input(batch: dict, im_hw) -> jnp.ndarray:
    """Assemble the 17-channel cascade>=1 encoder input.

    Mirrors wrapperBRDF.py:56-104: the previous cascade's predictions are
    bilinearly upsampled to the image size, the diffuse/specular pair is
    re-fit onto the pooled image with LSregressDiffSpec (on detached inputs)
    then upsampled, and albedo/depth are mean-normalized to mean 1/3.
    Expects batch keys ``albedo_pre/normal_pre/rough_pre/depth_pre/
    diffuse_pre/specular_pre`` (NHWC at the lighting resolution) and ``im``.
    """
    h, w = im_hw
    im = batch["im"]

    def up(x):
        if x.shape[1] < h or x.shape[2] < w:
            return resize_bilinear(x, (h, w))
        return x

    albedo_pre = up(batch["albedo_pre"])
    normal_pre = up(batch["normal_pre"])
    rough_pre = up(batch["rough_pre"])
    depth_pre = up(batch["depth_pre"])

    diffuse_pre, specular_pre = batch["diffuse_pre"], batch["specular_pre"]
    er, ec = diffuse_pre.shape[1], diffuse_pre.shape[2]
    im_small = adaptive_avg_pool(im, (er, ec))
    diffuse_pre, specular_pre = ls_regress_diff_spec(
        jax.lax.stop_gradient(diffuse_pre),
        jax.lax.stop_gradient(specular_pre),
        im_small,
        diffuse_pre,
        specular_pre,
    )
    diffuse_pre, specular_pre = up(diffuse_pre), up(specular_pre)

    def mean_norm(x):
        b = x.shape[0]
        m = jnp.clip(jnp.mean(x.reshape(b, -1), axis=1), 1e-10, None)
        return x / m.reshape(b, 1, 1, 1) / 3.0

    return jnp.concatenate(
        [
            im,
            mean_norm(albedo_pre),
            normal_pre,
            rough_pre,
            mean_norm(depth_pre),
            diffuse_pre,
            specular_pre,
        ],
        axis=-1,
    )


def brdf_forward(nets: BRDFNets, params: dict, batch: dict) -> dict:
    """Run encoder + 4 heads; returns preds dict (NHWC).

    albedo/depth outputs are mapped from the tanh range to [0,1] with
    0.5(x+1) as in wrapperBRDF.py:111-114; normal is unit, rough in [-1,1].
    """
    im = batch["im"]
    if nets.cascade_level == 0:
        inp = im
    else:
        inp = prepare_cascade_input(batch, im.shape[1:3])

    feats = nets.encoder.apply(params["encoder"], inp)
    if nets.fuse_decoders:
        trunk = DecoderTrunk(dtype=nets._dtype)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            params["albedo"], params["normal"], params["rough"], params["depth"],
        )
        x_orig = jax.vmap(
            lambda p: trunk.apply(p, im.shape[1:3], feats)
        )(stacked).astype(jnp.float32)
        preds = {
            "albedo": 0.5 * (apply_head(x_orig[0], 0) + 1.0),
            "normal": apply_head(x_orig[1], 1),
            "rough": apply_head(x_orig[2], 2),
            "depth": 0.5 * (apply_head(x_orig[3], 4) + 1.0),
        }
    else:
        decs = nets.decoders
        preds = {
            "albedo": 0.5 * (decs["albedo"].apply(params["albedo"], im, feats) + 1.0),
            "normal": decs["normal"].apply(params["normal"], im, feats),
            "rough": decs["rough"].apply(params["rough"], im, feats),
            "depth": 0.5 * (decs["depth"].apply(params["depth"], im, feats) + 1.0),
        }
    return preds


def brdf_step(
    nets: BRDFNets,
    params: dict,
    batch: dict,
    axis_name: Optional[str] = None,
):
    """Forward + masked errors.  Returns (preds, errors)."""
    preds = brdf_forward(nets, params, batch)
    errors, _ = brdf_errors(
        preds["albedo"],
        preds["normal"],
        preds["rough"],
        preds["depth"],
        batch,
        axis_name=axis_name,
    )
    return preds, errors


def brdf_total_error(
    errors: dict,
    albedo_w: float = 1.5,
    normal_w: float = 1.0,
    rough_w: float = 0.5,
    depth_w: float = 0.5,
) -> jnp.ndarray:
    """trainBRDF.py:285-286: 4*albeW*albedo + normW*normal + rougW*rough + deptW*depth."""
    return (
        4.0 * albedo_w * errors["albedo"]
        + normal_w * errors["normal"]
        + rough_w * errors["rough"]
        + depth_w * errors["depth"]
    )
