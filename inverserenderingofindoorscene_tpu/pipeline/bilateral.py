"""Bilateral refinement step composition (the trainBRDFBilateral wrapper).

Mirrors /root/reference/trainBRDFBilateral.py:264-350: run the frozen BRDF
stack, refine albedo / rough / depth with the confidence-CNN-weighted
bilateral solver (normal passes through untouched — the reference only
refines it at test time, trainBRDFBilateral.py:271-272), LSregress both
raw and refined predictions onto the GT, and compute the masked errors.
The solver runs fully on device (ops/bilateral.py) instead of the
reference's per-image CPU scipy round-trip.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core.scale import ls_regress
from inverserenderingofindoorscene_tpu.losses.masked import masked_sq_sum
from inverserenderingofindoorscene_tpu.models.bilateral_net import ConfidenceNet
from inverserenderingofindoorscene_tpu.ops.bilateral import (
    MODE_PARAMS,
    bilateral_solve_stats,
)
from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets, brdf_forward


@dataclasses.dataclass(frozen=True)
class BilateralNets:
    """Confidence CNNs for the albedo/rough/depth refiners.

    ``v_max``: solver vertex capacity (None = one per pixel, the upper
    bound).  ``e_max``: compact edge-list capacity for the blur's eight
    gather directions (None = dense [10, V] neighbor tables).  Both are
    static shapes; results are EXACT whenever the true counts fit — the
    step's nvert/nedges metrics let callers validate per batch."""

    v_max: Optional[int] = None  # default: one vertex per pixel (upper bound)
    e_max: Optional[int] = None  # default: dense neighbor tables

    @property
    def nets(self):
        return {
            "albedo": ConfidenceNet(in_channels=6),
            "rough": ConfidenceNet(in_channels=4),
            "depth": ConfidenceNet(in_channels=4),
        }

    def init(self, rng, im_hw=(240, 320)):
        h, w = im_hw

        def _init(rng):
            im = jnp.zeros((1, h, w, 3), jnp.float32)
            ks = jax.random.split(rng, 3)
            params = {}
            for k, (name, net) in zip(ks, self.nets.items()):
                c = 3 if name == "albedo" else 1
                params[name] = net.init(k, im, jnp.zeros((1, h, w, c)))
            return params

        return jax.jit(_init)(rng)


def normalized_guide(albedo_pred: jnp.ndarray) -> jnp.ndarray:
    """The solver's grid guide: the detached albedo prediction,
    max-normalized per image like the reference (BilateralLayer.py:250-253:
    feature / clamp(max(feature), 1e-5, 1))."""
    guide = jax.lax.stop_gradient(albedo_pred)
    b = guide.shape[0]
    gmax = jnp.clip(
        jnp.max(guide.reshape(b, -1), axis=1), 1e-5, 1.0
    ).reshape(b, 1, 1, 1)
    return guide / gmax


def refine(
    nets: BilateralNets,
    params: dict,
    im: jnp.ndarray,
    preds: dict,
):
    """Refine albedo/rough/depth; returns (refined preds dict, confs dict).

    Call pattern per mode (trainBRDFBilateral.py:267-281):
      albedo: bs(im, albedoPred.detach(), albedoPred), mode 0
      rough:  bs(im, albedoPred.detach(), 0.5(roughPred+1)), mode 2,
              output mapped back with clamp(2x-1, -1, 1)
      depth:  bs(im, albedoPred.detach(), depthPred), mode 4
    The grid guide (``feature``) is always the detached albedo prediction.
    """
    v_max = nets.v_max or (im.shape[1] * im.shape[2])
    e_max = nets.e_max
    guide = normalized_guide(preds["albedo"])
    modules = nets.nets

    # THREE sequential solves, deliberately: the batched alternative
    # (ops/bilateral.py bilateral_solve_multi — all 3*B problems sharing
    # each sort/scan/while launch) was built, parity-tested, and
    # A/B-measured SLOWER on-chip (414 vs 236 ms/step at the reference
    # operating point: the [3B, E] batched edge gathers inside the PCG
    # whiles lower far worse than per-mode flat ones).  It ships as a
    # tested ablation; see BASELINE.md.
    conf_a = modules["albedo"].apply(params["albedo"], im, preds["albedo"])
    albedo_bs, st_a = bilateral_solve_stats(
        guide, preds["albedo"], conf_a, MODE_PARAMS[0], v_max, e_max
    )

    rough01 = 0.5 * (preds["rough"] + 1.0)
    conf_r = modules["rough"].apply(params["rough"], im, rough01)
    rough_bs, st_r = bilateral_solve_stats(
        guide, rough01, conf_r, MODE_PARAMS[2], v_max, e_max
    )
    rough_bs = jnp.clip(2.0 * rough_bs - 1.0, -1.0, 1.0)

    conf_d = modules["depth"].apply(params["depth"], im, preds["depth"])
    depth_bs, st_d = bilateral_solve_stats(
        guide, preds["depth"], conf_d, MODE_PARAMS[4], v_max, e_max
    )

    refined = {
        "albedo": albedo_bs,
        "normal": jax.lax.stop_gradient(preds["normal"]),
        "rough": rough_bs,
        "depth": depth_bs,
    }
    confs = {"albedo": conf_a, "rough": conf_r, "depth": conf_d}
    stats = {"albedo": st_a, "rough": st_r, "depth": st_d}
    return refined, confs, stats


def bilateral_step(
    brdf_nets: BRDFNets,
    bs_nets: BilateralNets,
    brdf_params: dict,
    bs_params: dict,
    batch: dict,
    axis_name: Optional[str] = None,
):
    """Frozen BRDF forward + refinement + masked errors.

    Returns (losses dict with raw/bs variants, aux)."""
    preds = brdf_forward(brdf_nets, brdf_params, batch)
    preds = jax.tree_util.tree_map(jax.lax.stop_gradient, preds)
    refined, confs, stats = refine(bs_nets, bs_params, batch["im"], preds)

    seg_brdf, seg_all = batch["seg_brdf"], batch["seg_all"]

    def fit(p, gt, seg, clamp01=False):
        out = ls_regress(p * seg, gt * seg, p)
        return jnp.clip(out, 0.0, 1.0) if clamp01 else out

    albedo_gt = batch["albedo"]
    losses = {}
    for tag, pr in (("raw", preds), ("bs", refined)):
        a = fit(pr["albedo"], albedo_gt, seg_brdf, clamp01=True)
        d = fit(pr["depth"], batch["depth"], seg_all)
        losses[f"albedo_{tag}"] = masked_sq_sum(
            a, albedo_gt, seg_brdf, 3.0, axis_name
        )
        losses[f"rough_{tag}"] = masked_sq_sum(
            pr["rough"], batch["rough"], seg_brdf, 1.0, axis_name
        )
        losses[f"depth_{tag}"] = masked_sq_sum(
            jnp.log(d + 1.0), jnp.log(batch["depth"] + 1.0), seg_all, 1.0,
            axis_name,
        )
    losses["normal_raw"] = masked_sq_sum(
        preds["normal"], batch["normal"], seg_all, 3.0, axis_name
    )
    aux = {"preds": preds, "refined": refined, "confs": confs,
           "grid_stats": stats}
    return losses, aux


def bilateral_total_error(
    losses: dict,
    albedo_w: float = 1.5,
    rough_w: float = 0.5,
    depth_w: float = 0.5,
) -> jnp.ndarray:
    """trainBRDFBilateral.py:345-347: 4*albeW*albedoBs + rougW*roughBs +
    deptW*depthBs (normal skipped)."""
    return (
        4.0 * albedo_w * losses["albedo_bs"]
        + rough_w * losses["rough_bs"]
        + depth_w * losses["depth_bs"]
    )
