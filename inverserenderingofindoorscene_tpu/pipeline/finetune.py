"""Real-data fine-tune step compositions (wrapperIIW / wrapperNYU).

The fine-tune drivers alternate one synthetic batch (full BRDF losses) and
one real-data batch per optimizer cycle
(/root/reference/trainFineTuneIIW.py:147-263, trainFineTuneNYU.py:170-264);
here each half is a pure step function and the alternation is the
training driver's loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core.imageops import resize_bilinear
from inverserenderingofindoorscene_tpu.core.scale import (
    ls_regress,
    ls_regress_diff_spec,
)
from inverserenderingofindoorscene_tpu.losses.ranking import batch_ranking_loss
from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets, brdf_forward


def synthesize_pre(
    brdf_nets0: "BRDFNets",
    light_nets0,
    brdf_params0,
    light_params0,
    batch: dict,
) -> dict:
    """Run the frozen cascade-0 BRDF+Light stack inline to synthesize the
    ``*_pre`` inputs for a real-data batch at cascade 1
    (trainFineTuneIIW_cascade1.py:300-362): mean-normalized albedo/depth,
    [0,1]-shifted normal/rough, LSregressDiffSpec-fit diffuse/specular at
    the lighting grid, and the flat SG tensor.  Returns batch + pre keys
    (all stop-gradiented).
    """
    import jax as _jax

    from inverserenderingofindoorscene_tpu.core import sg as _sg
    from inverserenderingofindoorscene_tpu.core.imageops import (
        adaptive_avg_pool,
    )
    from inverserenderingofindoorscene_tpu.core.render_layer import RenderLayer
    from inverserenderingofindoorscene_tpu.pipeline.light import (
        light_forward,
        mean_normalize,
    )

    im = batch["im"]
    preds = brdf_forward(brdf_nets0, brdf_params0, {"im": im})
    preds = dict(preds)
    preds["albedo"] = mean_normalize(preds["albedo"])
    preds["depth"] = mean_normalize(preds["depth"])

    sg_out = light_forward(light_nets0, light_params0, im, preds)
    lamb = _sg.unsquash(sg_out["lamb01"])
    weight = _sg.unsquash(sg_out["weight01"])
    env_img = _sg.sg_to_envmap(
        sg_out["axis"], lamb, weight,
        light_nets0.env_height, light_nets0.env_width,
    )
    r, c = light_nets0.env_rows, light_nets0.env_cols
    layer = RenderLayer(env_rows=r, env_cols=c,
                        env_height=light_nets0.env_height,
                        env_width=light_nets0.env_width)
    diffuse, specular = layer.forward_env(
        preds["albedo"], preds["normal"], preds["rough"],
        jax.lax.stop_gradient(env_img),
    )
    im_small = adaptive_avg_pool(im, (r, c))
    diffuse, specular = ls_regress_diff_spec(
        diffuse, specular, im_small, diffuse, specular
    )

    out = dict(batch)
    pre = {
        "albedo_pre": preds["albedo"],
        "normal_pre": 0.5 * (preds["normal"] + 1.0),
        "rough_pre": 0.5 * (preds["rough"] + 1.0),
        "depth_pre": preds["depth"],
        "diffuse_pre": diffuse,
        "specular_pre": specular,
        "env_pre": sg_out["sg_flat"],
    }
    out.update(
        {k: _jax.lax.stop_gradient(v) for k, v in pre.items()}
    )
    return out


def iiw_step(nets: BRDFNets, params: dict, batch: dict):
    """wrapperIIW.py:80-113: forward + per-image ranking losses.

    batch keys: im [B,H,W,3], eq_point [B,N,4], eq_weight [B,N],
    eq_num [B], darker_* likewise. Returns (preds, eq_loss, darker_loss)
    with losses averaged over the batch.
    """
    preds = brdf_forward(nets, params, batch)

    def one(albedo, ep, ew, en, dp, dw, dn):
        return batch_ranking_loss(albedo, ep, ew, dp, dw, en, dn)

    eq_l, dk_l = jax.vmap(one)(
        preds["albedo"],
        batch["eq_point"],
        batch["eq_weight"],
        batch["eq_num"],
        batch["darker_point"],
        batch["darker_weight"],
        batch["darker_num"],
    )
    b = preds["albedo"].shape[0]
    return preds, jnp.sum(eq_l) / b, jnp.sum(dk_l) / b


def nyu_step(
    nets: BRDFNets,
    params: dict,
    batch: dict,
    axis_name: Optional[str] = None,
):
    """wrapperNYU.py:85-121: forward + NYU normal/depth losses.

    batch keys: im, normal (GT at possibly higher res), depth, seg_normal,
    seg_depth. Returns (preds, losses dict incl. mean angle in degrees).
    """
    preds = brdf_forward(nets, params, batch)
    normal_gt, depth_gt = batch["normal"], batch["depth"]
    hw = normal_gt.shape[1:3]

    normal_pred = resize_bilinear(preds["normal"], hw)
    depth_pred = resize_bilinear(preds["depth"], hw)

    seg_n, seg_d = batch["seg_normal"], batch["seg_depth"]
    depth_pred = ls_regress(
        jax.lax.stop_gradient(depth_pred) * seg_d, depth_gt * seg_d, depth_pred
    )

    def psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    n_normal = psum(jnp.sum(seg_n))
    n_depth = psum(jnp.sum(seg_d))

    normal_err = psum(
        jnp.sum((normal_pred - normal_gt) ** 2 * seg_n)
    ) / jnp.clip(n_normal, 1e-5, None) / 3.0
    depth_err = psum(
        jnp.sum(
            (jnp.log(depth_pred + 0.1) - jnp.log(depth_gt + 0.1)) ** 2 * seg_d
        )
    ) / jnp.clip(n_depth, 1e-5, None)
    angle = psum(
        jnp.sum(
            jnp.arccos(
                jnp.clip(
                    jnp.sum(normal_pred * normal_gt, axis=-1, keepdims=True),
                    -1.0,
                    1.0,
                )
            )
            / jnp.pi
            * 180.0
            * seg_n
        )
    ) / jnp.clip(n_normal, 1e-5, None)

    losses = {"normal": normal_err, "depth": depth_err, "angle_deg": angle}
    preds = dict(preds)
    preds["normal_full"] = normal_pred
    preds["depth_full"] = depth_pred
    return preds, losses
