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
from inverserenderingofindoorscene_tpu.core.scale import ls_regress
from inverserenderingofindoorscene_tpu.losses.ranking import batch_ranking_loss
from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets, brdf_forward


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
