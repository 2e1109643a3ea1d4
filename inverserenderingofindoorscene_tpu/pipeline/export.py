"""Cascade hand-off: export cascade-k intermediates next to the dataset.

The outputBRDFLight equivalent (/root/reference/outputBRDFLight.py:195-301):
runs the frozen BRDF+Light stack, then writes the 7 intermediate products
as per-image `*_{cascade}.h5` files beside the dataset images, skipping
files that already exist.  The on-disk contract (names, CHW 'data'
dataset, LZF) is byte-compatible with the reference so either framework's
cascade-0 outputs feed the other's cascade-1 training.
"""

from __future__ import annotations

import os.path as osp

import jax
import numpy as np

from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
from inverserenderingofindoorscene_tpu.pipeline.light import (
    LightNets,
    light_step,
    mean_normalize,
)
from inverserenderingofindoorscene_tpu.utils.io import write_h5


def export_step(
    brdf_nets: BRDFNets,
    light_nets: LightNets,
    brdf_params,
    light_params,
    batch,
    offset: float = 1.0,
):
    """Jittable forward producing the 7 products (NHWC jnp arrays).

    Returns (products dict, losses dict). albedo/depth are mean-normalized
    to mean 1/3 (outputBRDFLight.py:255-260, 276-280; idempotent with the
    wrapper's normalization). The sg_flat tensor is the 84-channel SG
    cascade tensor; diffuse/specular are the raw rendered components.
    """
    losses, aux = light_step(
        brdf_nets, light_nets, brdf_params, light_params, batch,
        offset=offset,
    )
    preds = aux["brdf_preds"]
    products = {
        "albedo": mean_normalize(preds["albedo"]),
        "normal": preds["normal"],
        "rough": preds["rough"],
        "depth": mean_normalize(preds["depth"]),
        "diffuse": aux["diffuse"],
        "specular": aux["specular"],
        "env": aux["sg"]["sg_flat"],
    }
    return products, losses


_STEMS = {
    "albedo": "imbaseColor_",
    "normal": "imnormal_",
    "rough": "imroughness_",
    "depth": "imdepth_",
    "diffuse": "imdiffuse_",
    "specular": "imspecular_",
    "env": "imenv_",
}


def write_products(products, names, cascade_level, env_ind=None,
                   skip_existing=True):
    """Write per-image h5 files with the reference naming convention.

    names: the dataset 'im_*.hdr' paths of the batch. env products are only
    written when env_ind[n] == 1 (outputBRDFLight.py:296-301)."""
    products = {k: np.asarray(jax.device_get(v)) for k, v in products.items()}
    written = []
    for n, im_name in enumerate(names):
        for key, stem in _STEMS.items():
            out = im_name.replace("im_", stem).replace(
                ".hdr", "_%d.h5" % cascade_level
            )
            if key == "env" and env_ind is not None and env_ind[n] != 1:
                continue
            if skip_existing and osp.isfile(out):
                continue
            write_h5(products[key][n], out)  # stored CHW like the reference
            written.append(out)
    return written
