"""In-the-wild two-cascade inference (the testReal.py equivalent).

Per image (/root/reference/testReal.py:285-660): aspect-preserving resize
(fov 57 landscape / 42.75 portrait), gamma 2.2 to linear, cascade-0 BRDF ->
light -> physically-based render -> global light/albedo scale
disambiguation from the diffuse/specular fit coefficients -> cascade-1
(17-ch input with the rendered components) -> light 1 -> bilateral
refinement of albedo/rough/depth, then writes npy/png/npz products.

Usage: python -m inverserenderingofindoorscene_tpu.cli.test_real \
    --imList images.txt --output out/ [--level 2] [--isLight] [--isBS]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np

import jax

from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
from inverserenderingofindoorscene_tpu.pipeline.inference import (  # noqa: F401
    InverseRenderer,
    bs_prep,
    load_real_image,
    make_bs_fn,
    predict_brdf,
    predict_light,
    predict_light_core,
    refine_bs,
)
from inverserenderingofindoorscene_tpu.pipeline.light import LightNets
from inverserenderingofindoorscene_tpu.utils.io import (
    write_envmap_mosaic,
    write_image,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--imList", required=True,
                   help="text file of image paths (png/jpg)")
    p.add_argument("--output", required=True)
    p.add_argument("--level", type=int, default=2, choices=[1, 2])
    p.add_argument("--isLight", action="store_true")
    p.add_argument("--isBS", action="store_true")
    p.add_argument("--imHeight", type=int, default=240)
    p.add_argument("--imWidth", type=int, default=320)
    p.add_argument("--envRow", type=int, default=120)
    p.add_argument("--envCol", type=int, default=160)
    p.add_argument("--envHeight", type=int, default=8)
    p.add_argument("--envWidth", type=int, default=16)
    p.add_argument("--SGNum", type=int, default=12)
    p.add_argument("--experimentBRDF0", default=None)
    p.add_argument("--experimentBRDF1", default=None)
    p.add_argument("--experimentLight0", default=None)
    p.add_argument("--experimentLight1", default=None)
    p.add_argument("--epochBRDF", type=int, default=None)
    p.add_argument("--epochLight", type=int, default=None)
    p.add_argument("--bsExperiment", default=None,
                   help="trained confidence-CNN checkpoint dir used for "
                        "every level; unit confidence if absent")
    p.add_argument("--bsExperiment0", default=None,
                   help="per-level override of --bsExperiment (the "
                        "reference loads one BS stack per cascade level)")
    p.add_argument("--bsExperiment1", default=None)
    p.add_argument("--bsEpoch", type=int, default=None)
    p.add_argument("--vMax", default="auto",
                   help="bilateral vertex capacity: 'auto' (exact "
                        "ladder-bucketed dispatch on the counted guide "
                        "cells), 'full' (one vertex per pixel), or an int")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--computeDtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="conv-stack compute dtype (params stay f32; "
                        "bfloat16 roughly halves conv time on the MXU)")
    p.add_argument("--fused", action="store_true",
                   help="compile the whole BRDF/light chain into one XLA "
                        "program (cLight branch traced as jnp.where) "
                        "instead of per-stage programs: one dispatch and "
                        "one device sync per image")
    p.add_argument("--usePallas", action="store_true",
                   help="route the SG decode/render through the fused "
                        "Pallas forward kernels; default is the jnp path, "
                        "which A/B-measures FASTER at batch-1 inference "
                        "(83.2 vs 97.8 ms/image - kernel launch/relayout "
                        "overheads beat fusion gains at B1; the kernels "
                        "win in training where batches amortize them)")
    return p.parse_args(argv)


def load_stack(opt):
    """Build 2x BRDF + 2x Light stacks and load checkpoints if present."""
    from inverserenderingofindoorscene_tpu.train.steps import (
        create_train_state,
        reference_adam,
    )
    from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt

    rng = jax.random.PRNGKey(opt.seed)
    stacks = []
    for lvl in range(opt.level):
        k1, k2, rng = jax.random.split(rng, 3)
        brdf = BRDFNets(cascade_level=lvl, compute_dtype=opt.computeDtype)
        bp = brdf.init(k1, (opt.imHeight, opt.imWidth))
        from inverserenderingofindoorscene_tpu.cli import common

        exp = getattr(opt, f"experimentBRDF{lvl}") or (
            common.default_experiment_name(opt, "brdf", cascade=lvl)
        )
        ep = opt.epochBRDF
        if ep is None:
            ep = ckpt.latest_epoch(exp, "brdf", lvl)
        if ep is not None:
            st = create_train_state(bp, reference_adam(1e-4))
            bp = ckpt.restore_checkpoint(exp, "brdf", lvl, ep, st).params
            print(f"loaded BRDF level {lvl} from {exp} epoch {ep}")

        light = LightNets(
            sg_num=opt.SGNum, cascade_level=lvl,
            env_rows=opt.envRow, env_cols=opt.envCol,
            env_height=opt.envHeight, env_width=opt.envWidth,
            compute_dtype=opt.computeDtype,
        )
        lp = light.init(k2)
        exp = getattr(opt, f"experimentLight{lvl}") or (
            common.default_experiment_name(opt, "light", offset=1.0,
                                           cascade=lvl)
        )
        ep = opt.epochLight
        if ep is None:
            ep = ckpt.latest_epoch(exp, "light", lvl)
        if ep is not None:
            st = create_train_state(lp, reference_adam(1e-4))
            lp = ckpt.restore_checkpoint(exp, "light", lvl, ep, st).params
            print(f"loaded Light level {lvl} from {exp} epoch {ep}")
        stacks.append((brdf, bp, light, lp))
    return stacks


def load_bs_params(opt):
    """Per-level trained confidence-CNN params (None entries = unit
    confidence), mirroring the reference's per-level BS checkpoints
    (testReal.py:184-202, albedoBs{n}_..pth per cascade level)."""
    from inverserenderingofindoorscene_tpu.pipeline.bilateral import (
        BilateralNets,
    )
    from inverserenderingofindoorscene_tpu.train.steps import (
        create_train_state,
        reference_adam,
    )
    from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt

    from inverserenderingofindoorscene_tpu.cli import common

    out = []
    for lvl in range(opt.level):
        exp = getattr(opt, f"bsExperiment{lvl}") or (
            opt.bsExperiment
            or common.default_experiment_name(opt, "bs", cascade=lvl)
        )
        ep = opt.bsEpoch
        if ep is None:
            ep = ckpt.latest_epoch(exp, "bs", lvl)
        if ep is None:
            out.append(None)
            continue
        nets = BilateralNets()
        params = nets.init(jax.random.PRNGKey(opt.seed),
                           (opt.imHeight, opt.imWidth))
        state = create_train_state(params, reference_adam(1e-4))
        state = ckpt.restore_checkpoint(exp, "bs", lvl, ep, state)
        print(f"loaded level-{lvl} confidence CNNs from {exp} epoch {ep}")
        out.append(state.params)
    return out


def main(argv=None):
    from inverserenderingofindoorscene_tpu.cli.common import (
        enable_compile_cache,
    )

    enable_compile_cache()
    opt = parse_args(argv)
    os.makedirs(opt.output, exist_ok=True)
    stacks = load_stack(opt)

    with open(opt.imList) as f:
        im_list = [x.strip() for x in f if x.strip()]

    bs_params = load_bs_params(opt) if opt.isBS else None
    renderer = InverseRenderer(
        stacks,
        is_light=opt.isLight,
        is_bs=opt.isBS,
        bs_params=bs_params,
        v_max=opt.vMax,
        use_pallas=opt.usePallas,
        fused=opt.fused,
    )

    # Decode/resize the NEXT photo on host threads while the device runs
    # the current one (the reference loop is strictly serial,
    # testReal.py:285-343); lookahead 2 bounds host memory.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=2)

    def _load(p):
        return load_real_image(
            p, (opt.imHeight, opt.imWidth), (opt.envRow, opt.envCol),
            return_original=True,
        )

    pending = deque(pool.submit(_load, p) for p in im_list[:2])
    for idx, im_path in enumerate(im_list):
        name = osp.splitext(osp.basename(im_path))[0]
        im_np, im_small_np, fov, im_orig = pending.popleft().result()
        if idx + 2 < len(im_list):
            pending.append(pool.submit(_load, im_list[idx + 2]))
        result = renderer(
            jax.numpy.asarray(im_np), jax.numpy.asarray(im_small_np), fov
        )
        all_preds = result["preds"]
        lights = result["lights"]
        bs_out = result["refined"]

        # write products — PER LEVEL, like the reference
        # (testReal.py:542-660 loops every product list over the levels).
        # PNG products are resized to the LAST level's fitted input size
        # (nw, nh) exactly as testReal.py:318 reassigns nh/nw to
        # newImHeight[-1]/newImWidth[-1] before the product loop; npys
        # mirror the reference product-by-product: normal npy is saved
        # RESIZED (testReal.py:565), depth npys at network resolution.
        def out(n):
            return osp.join(opt.output, n)

        import cv2

        nh, nw = im_np.shape[1:3]

        def to_nwnh(arr):
            """Resize a prediction to the final fitted size (identity
            when the levels share one size, the CLI's single-im_hw case)."""
            arr = np.asarray(arr, np.float32)
            if arr.shape[:2] == (nh, nw):
                return arr
            return cv2.resize(arr, (nw, nh),
                              interpolation=cv2.INTER_LINEAR)

        # the unresized input photo, a product of its own
        # (testReal.py:659-660 cv2.imwrite(imOutputNames[0], im_cpu))
        from PIL import Image

        Image.fromarray(im_orig).save(out(f"{name}.png"))

        # per-level cAlbedo/cLight: the global-scale disambiguation of the
        # level whose light ran (testReal.py:546-549 `n < len(cAlbedos)`);
        # reshape(-1)[0]: the staged path yields host floats, the fused
        # path [B=1] device arrays — normalize both to float
        scales = [
            (
                float(np.asarray(lo["c_albedo"]).reshape(-1)[0]),
                float(np.asarray(lo["c_light"]).reshape(-1)[0]),
            )
            for lo in lights
        ]

        for lvl, preds in enumerate(all_preds):
            c_albedo = scales[lvl][0] if lvl < len(scales) else 1.0
            albedo_out = np.asarray(preds["albedo"][0]) * c_albedo
            # albedo npy is a superset product (the reference allocates
            # albedoNames but never np.saves them); PNG applies gamma
            # BEFORE the resize like testReal.py:551-553
            np.save(out(f"{name}_albedo{lvl}.npy"), albedo_out)
            write_image(
                to_nwnh(np.clip(albedo_out, 0, None) ** (1.0 / 2.2)),
                out(f"{name}_albedo{lvl}.png"),
            )
            # the normal npy is saved RESIZED (testReal.py:562-565; the
            # resized vectors are NOT re-normalized there either)
            normal_r = to_nwnh(np.asarray(preds["normal"][0]))
            np.save(out(f"{name}_normal{lvl}.npy"), normal_r)
            write_image(0.5 * (normal_r + 1.0),
                        out(f"{name}_normal{lvl}.png"))
            rough = np.asarray(preds["rough"][0])
            np.save(out(f"{name}_rough{lvl}.npy"), rough)  # superset
            write_image(0.5 * (to_nwnh(rough) + 1.0),
                        out(f"{name}_rough{lvl}.png"))
            d = np.asarray(preds["depth"][0])
            np.save(out(f"{name}_depth{lvl}.npy"), d)
            # depth PNG: mean-normalize to 3, resize, 1/(d+1) viz
            # (testReal.py:578-588)
            dn = to_nwnh(d / max(float(d.mean()), 1e-10) * 3.0)
            write_image(1.0 / np.clip(dn + 1.0, 1e-6, 10.0),
                        out(f"{name}_depth{lvl}.png"))

        # light products are written only with --isLight (reference
        # testReal.py:622); without it cascade-0's light ran solely to
        # feed the cascade-1 input and is not a product
        for lvl, light_out in enumerate(lights if opt.isLight else []):
            c_albedo, c_light = scales[lvl]
            env_img = np.asarray(light_out["env_img"][0])
            er, ec = env_img.shape[:2]
            # npz: the reference's key/layout — 'env' of shape
            # [R, C, eh, ew, 3] with channels flipped to the dataset's
            # BGR order (testReal.py:629-634 "Flip to be coincide with
            # our dataset")
            np.savez_compressed(
                out(f"{name}_envmap{lvl}.npz"),
                env=np.ascontiguousarray(
                    env_img.reshape(er, ec, opt.envHeight, opt.envWidth,
                                    3)[..., ::-1]
                ),
            )
            # SG params npy: the reference's name and CHW layout
            # ([1, SGNum*7, R, C], testReal.py:636-638 envmapsPredSGNames)
            np.save(
                out(f"{name}_envmapSG{lvl}.npy"),
                np.asarray(light_out["sg_flat"][0]).transpose(2, 0, 1)[
                    None
                ],
            )
            write_envmap_mosaic(
                env_img,
                out(f"{name}_envmap{lvl}.png"),
                nrows=24, ncols=16,  # testReal.py:634 writeEnvToFile
                env_height=opt.envHeight, env_width=opt.envWidth,
            )
            # rendered PNG: max-normalize, gamma BEFORE resize
            # (testReal.py:648-654)
            rendered = np.asarray(
                (light_out["diffuse"] + light_out["specular"])[0]
            )
            rp = (rendered / max(float(rendered.max()), 1e-10)) ** (
                1.0 / 2.2
            )
            write_image(to_nwnh(rp), out(f"{name}_rendered{lvl}.png"))
            # SG -> diffuse shading visualization, mean-normalized to
            # 1/3 (testReal.py:639-644 via utils.predToShading)
            from inverserenderingofindoorscene_tpu.utils.io import (
                pred_to_shading,
            )

            shading = pred_to_shading(
                np.asarray(light_out["sg_flat"][0]), sg_num=opt.SGNum
            )
            shading = shading / max(float(shading.mean()), 1e-10) / 3.0
            write_image(
                np.clip(shading, 0, 1),
                out(f"{name}_shading{lvl}.png"), gamma=True,
            )
            np.save(
                out(f"{name}_cLight{lvl}.npy"),
                np.array([c_albedo, c_light]),
            )
            # .mat export for the reference's downstream comparison tooling
            # (testReal.py:646 writes scipy.io.savemat {'cLight': ...})
            try:
                from scipy.io import savemat

                savemat(
                    out(f"{name}_cLight{lvl}.mat"),
                    {
                        "cLight": np.asarray(c_light),
                        "cAlbedo": np.asarray(c_albedo),
                    },
                )
            except ImportError:
                print("scipy unavailable; skipped .mat cLight export")

        if bs_out is not None:
            # 'BS' capitalization = the reference's runtime names (its
            # write loop builds them via .replace('albedo', 'albedoBS'),
            # testReal.py:592-625 — the names downstream CompareWHDR.py:72
            # / CompareDepth.py:10 glob for)
            for lvl, bso in enumerate(bs_out):
                c_albedo = scales[lvl][0] if lvl < len(scales) else 1.0
                albedo_bs = np.asarray(bso["albedo"][0]) * c_albedo
                np.save(out(f"{name}_albedoBS{lvl}.npy"), albedo_bs)
                write_image(
                    to_nwnh(np.clip(albedo_bs, 0, None) ** (1.0 / 2.2)),
                    out(f"{name}_albedoBS{lvl}.png"),
                )
                rough_bs = np.asarray(bso["rough"][0])
                np.save(out(f"{name}_roughBS{lvl}.npy"), rough_bs)
                write_image(0.5 * (to_nwnh(rough_bs) + 1.0),
                            out(f"{name}_roughBS{lvl}.png"))
                d_bs = np.asarray(bso["depth"][0])
                np.save(out(f"{name}_depthBS{lvl}.npy"), d_bs)
                dn = to_nwnh(d_bs / max(float(d_bs.mean()), 1e-10) * 3.0)
                write_image(1.0 / np.clip(dn + 1.0, 1e-6, 10.0),
                            out(f"{name}_depthBS{lvl}.png"))
        print(f"done {im_path} -> {opt.output}/{name}_*")
    pool.shutdown()


if __name__ == "__main__":
    main()
