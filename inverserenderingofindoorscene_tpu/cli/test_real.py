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
import functools
import os
import os.path as osp

import numpy as np

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core import sg
from inverserenderingofindoorscene_tpu.core.imageops import resize_bilinear
from inverserenderingofindoorscene_tpu.core.render_layer import RenderLayer
from inverserenderingofindoorscene_tpu.core.scale import ls_regress_diff_spec
from inverserenderingofindoorscene_tpu.ops.bilateral import (
    MODE_PARAMS,
    bilateral_solve,
)
from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
from inverserenderingofindoorscene_tpu.pipeline.light import (
    LightNets,
    light_forward,
    light_input_from_preds,
    mean_normalize,
)
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
                   help="trained confidence-CNN checkpoint dir; unit "
                        "confidence if absent")
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


def load_real_image(path, im_hw, env_rc):
    """Aspect-preserving resize + fov selection (testReal.py:290-343).

    Returns (im [1,h,w,3] linear, im_small [1,eh,ew,3], fov_deg)."""
    import cv2

    im_cpu = cv2.imread(path)
    assert im_cpu is not None, path
    im_cpu = im_cpu[:, :, ::-1]
    nh, nw = im_cpu.shape[:2]

    def fit(max_h, max_w):
        if nh < nw:
            w = max_w
            h = int(float(max_w) / nw * nh)
        else:
            h = max_h
            w = int(float(max_h) / nh * nw)
        # reference quirk kept for parity (testReal.py:306-309): INTER_AREA
        # when UPSCALING (nh < newH), INTER_LINEAR when downscaling
        interp = cv2.INTER_AREA if nh < h else cv2.INTER_LINEAR
        out = cv2.resize(im_cpu, (w, h), interpolation=interp)
        out = out.astype(np.float32) / 255.0
        out = out / out.max()
        return (out ** 2.2)[None]

    im = fit(*im_hw)
    im_small = fit(*env_rc)
    fov = 57.0 if nh < nw else 42.75
    return im, im_small, fov


def predict_brdf(brdf_nets, bp, im, extra=None):
    """Encoder+decoders with the testReal mean normalization (365-375)."""
    inp = im if extra is None else jnp.concatenate([im] + extra, axis=-1)
    feats = brdf_nets.encoder.apply(bp["encoder"], inp)
    decs = brdf_nets.decoders
    preds = {
        "albedo": 0.5 * (decs["albedo"].apply(bp["albedo"], im, feats) + 1.0),
        "normal": decs["normal"].apply(bp["normal"], im, feats),
        "rough": decs["rough"].apply(bp["rough"], im, feats),
        "depth": 0.5 * (decs["depth"].apply(bp["depth"], im, feats) + 1.0),
    }
    preds["albedo"] = mean_normalize(preds["albedo"])
    preds["depth"] = mean_normalize(preds["depth"])
    return preds


def predict_light_core(light_nets, lp, im, preds, im_small, fov,
                       env_pre=None, use_pallas=False):
    """Jittable part of the light stack + render + LSregressDiffSpec
    (testReal.py:382-419). The data-dependent cLight/cAlbedo branching
    stays in Python (predict_light).

    ``use_pallas``: route the SG->envmap decode and the shading integral
    through the fused forward kernels (ops/sg_render.py) instead of the
    jnp path — same math (kernel parity tests), faster on TPU."""
    eh, ew = im_small.shape[1:3]
    inp = light_input_from_preds(im, preds, (eh * 4, ew * 4))
    feats = light_nets.encoder.apply(lp["encoder"], inp, env_pre)
    decs = light_nets.decoders
    axis = decs["axis"].apply(lp["axis"], feats, (eh, ew))
    lamb01 = decs["lamb"].apply(lp["lamb"], feats, (eh, ew))
    weight01 = decs["weight"].apply(lp["weight"], feats, (eh, ew))
    b = axis.shape[0]
    sg_flat = jnp.concatenate(
        [axis.reshape(b, eh, ew, -1), lamb01,
         weight01.reshape(b, eh, ew, -1)],
        axis=-1,
    )
    if use_pallas:
        from inverserenderingofindoorscene_tpu.core.imageops import (
            adaptive_avg_pool,
        )
        from inverserenderingofindoorscene_tpu.ops.sg_render import (
            render_sg,
            sg_envmap,
        )

        interp = jax.default_backend() != "tpu"
        lamb = sg.unsquash(lamb01)
        weight = sg.unsquash(weight01)
        env_img = sg_envmap(
            axis, lamb, weight,
            light_nets.env_height, light_nets.env_width, interpret=interp,
        )
        diffuse, specular = render_sg(
            adaptive_avg_pool(preds["albedo"], (eh, ew)),
            adaptive_avg_pool(preds["normal"], (eh, ew)),
            adaptive_avg_pool(preds["rough"], (eh, ew)),
            axis, lamb, weight,
            fov_deg=fov,
            env_height=light_nets.env_height,
            env_width=light_nets.env_width,
            interpret=interp,
        )
    else:
        env_img, _, _, _ = sg.squashed_sg_to_envmap(
            axis, lamb01, weight01, light_nets.env_height,
            light_nets.env_width
        )
        layer = RenderLayer(
            env_rows=eh, env_cols=ew,
            env_height=light_nets.env_height,
            env_width=light_nets.env_width,
            fov_deg=fov,
        )
        diffuse, specular = layer.forward_env(
            preds["albedo"], preds["normal"], preds["rough"], env_img
        )
    diffuse_new, specular_new = ls_regress_diff_spec(
        diffuse, specular, im_small, diffuse, specular
    )
    return {
        "sg_flat": sg_flat,
        "env_img": env_img,
        "diffuse_raw": diffuse,
        "specular_raw": specular,
        "diffuse": diffuse_new,
        "specular": specular_new,
        "albedo_max": jnp.max(preds["albedo"]),
    }


def predict_light(core_out):
    """cLight/cAlbedo global-scale disambiguation (testReal.py:421-432) —
    Python branching on concrete values, applied to a jitted core output."""
    c_diff = float(
        jnp.sum(core_out["diffuse"]) / jnp.sum(core_out["diffuse_raw"])
    )
    c_spec = float(
        jnp.sum(core_out["specular"]) / jnp.sum(core_out["specular_raw"])
    )
    albedo_max = float(core_out["albedo_max"])
    if c_spec < 1e-3:
        c_albedo = 1.0 / albedo_max
        c_light = c_diff / c_albedo
    else:
        c_light = c_spec
        c_albedo = float(np.clip(c_diff / c_light, 1e-3, 1.0 / albedo_max))
        c_light = c_diff / c_albedo
    return {
        "sg_flat": core_out["sg_flat"],
        "env_img": core_out["env_img"] * c_light,
        "diffuse": core_out["diffuse"],
        "specular": core_out["specular"],
        "c_albedo": c_albedo,
        "c_light": c_light,
    }


def load_bs_params(opt):
    """Trained confidence-CNN params, or None for unit confidence."""
    from inverserenderingofindoorscene_tpu.pipeline.bilateral import (
        BilateralNets,
    )
    from inverserenderingofindoorscene_tpu.train.steps import (
        create_train_state,
        reference_adam,
    )
    from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt

    from inverserenderingofindoorscene_tpu.cli import common

    exp = opt.bsExperiment or common.default_experiment_name(
        opt, "bs", cascade=opt.level - 1
    )
    ep = opt.bsEpoch
    if ep is None:
        ep = ckpt.latest_epoch(exp, "bs", opt.level - 1)
    if ep is None:
        return None
    nets = BilateralNets()
    params = nets.init(jax.random.PRNGKey(opt.seed),
                       (opt.imHeight, opt.imWidth))
    state = create_train_state(params, reference_adam(1e-4))
    state = ckpt.restore_checkpoint(exp, "bs", opt.level - 1, ep, state)
    print(f"loaded confidence CNNs from {exp} epoch {ep}")
    return state.params


def bs_prep(im, preds, bs_params=None):
    """The jittable prefix of the refinement: max-normalized guide
    (BilateralLayer.py:250-253), per-mode targets and confidences (trained
    CNNs when a checkpoint is available, unit confidence otherwise).
    Returns (guide, targets dict, confs dict)."""
    h, w = im.shape[1:3]
    guide = preds["albedo"]
    gmax = jnp.clip(jnp.max(guide), 1e-5, 1.0)
    guide = guide / gmax
    targets = {
        "albedo": preds["albedo"],
        "rough": 0.5 * (preds["rough"] + 1.0),
        "depth": preds["depth"],
    }
    if bs_params is None:
        ones = jnp.ones((1, h, w, 1), jnp.float32)
        confs = {"albedo": ones, "rough": ones, "depth": ones}
    else:
        from inverserenderingofindoorscene_tpu.models.bilateral_net import (
            ConfidenceNet,
        )

        confs = {
            "albedo": ConfidenceNet(6).apply(
                bs_params["albedo"], im, targets["albedo"]
            ),
            "rough": ConfidenceNet(4).apply(
                bs_params["rough"], im, targets["rough"]
            ),
            "depth": ConfidenceNet(4).apply(
                bs_params["depth"], im, targets["depth"]
            ),
        }
    return guide, targets, confs


# (mode key, MODE_PARAMS id) in solve order
_BS_MODES = (("albedo", 0), ("rough", 2), ("depth", 4))


def refine_bs(im, preds, bs_params=None, v_max=None):
    """Bilateral refinement of albedo/rough/depth (testReal.py:532-540).

    ``v_max``: static vertex capacity; None = one per pixel (exact worst
    case). Exact smaller capacities: see BucketedSolver / --vMax auto."""
    h, w = im.shape[1:3]
    v_max = v_max or (h * w)
    guide, targets, confs = bs_prep(im, preds, bs_params)
    out = {
        k: bilateral_solve(guide, targets[k], confs[k], MODE_PARAMS[m], v_max)
        for k, m in _BS_MODES
    }
    out["rough"] = jnp.clip(2.0 * out["rough"] - 1.0, -1.0, 1.0)
    return out


def make_bs_fn(bs_params, v_max_opt):
    """The per-image refinement callable for the driver.

    v_max_opt: "full" (one vertex per pixel), "auto" (count the guide's
    occupied cells, dispatch to a ladder-bucketed compile — exact, but far
    fewer gather/sort rows on smooth guides), or an int capacity."""
    if v_max_opt != "auto":
        v_max = None if v_max_opt == "full" else int(v_max_opt)
        jit_bs = jax.jit(
            lambda bsp, im, preds: refine_bs(im, preds, bsp, v_max)
        )
        return functools.partial(jit_bs, bs_params)

    from inverserenderingofindoorscene_tpu.ops.bilateral import (
        BucketedSolver,
    )

    jit_prep = jax.jit(lambda bsp, im, preds: bs_prep(im, preds, bsp))
    post_rough = jax.jit(lambda x: jnp.clip(2.0 * x - 1.0, -1.0, 1.0))
    solver = BucketedSolver()
    mode_params = tuple(MODE_PARAMS[m] for _, m in _BS_MODES)

    def bs_fn(im, preds):
        guide, targets, confs = jit_prep(bs_params, im, preds)
        nv = solver.counts(guide, mode_params)
        out = {
            k: solver.solve(guide, targets[k], confs[k], p, n)
            for (k, _), p, n in zip(_BS_MODES, mode_params, nv)
        }
        out["rough"] = post_rough(out["rough"])
        return out

    return bs_fn


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

    # Jitted per-stage functions (recompiled per unique image aspect,
    # cached after).  Param trees are passed as ARGUMENTS, not closed
    # over: jit embeds closed-over arrays as HLO constants, and on the
    # remote-compile TPU backend the weight-laden program body exceeds
    # the compile request size limit (HTTP 413).  Passing them keeps the
    # program small and the weights on device.
    brdf0_nets, bp0_ = stacks[0][0], jax.device_put(stacks[0][1])
    light0_nets, lp0_ = stacks[0][2], jax.device_put(stacks[0][3])
    jit_brdf0 = functools.partial(
        jax.jit(lambda bp, im: predict_brdf(brdf0_nets, bp, im)), bp0_
    )
    # off-TPU the kernels run in interpret mode (slow but correct), so
    # the flag alone decides — which also lets CPU tests cover the branch
    use_pallas = opt.usePallas
    jit_light0 = functools.partial(
        jax.jit(
            lambda lp, im, preds, im_small, fov: predict_light_core(
                light0_nets, lp, im, preds, im_small, fov,
                use_pallas=use_pallas,
            ),
            static_argnums=(4,),
        ),
        lp0_,
    )
    if opt.level == 2:
        brdf1_nets, bp1_ = stacks[1][0], jax.device_put(stacks[1][1])
        light1_nets, lp1_ = stacks[1][2], jax.device_put(stacks[1][3])
        def _cascade1(bp, im, preds, diffuse, specular):
            hw = im.shape[1:3]
            extra = [
                resize_bilinear(preds["albedo"], hw),
                0.5 * (resize_bilinear(preds["normal"], hw) + 1.0),
                0.5 * (resize_bilinear(preds["rough"], hw) + 1.0),
                resize_bilinear(preds["depth"], hw),
                resize_bilinear(diffuse, hw),
                resize_bilinear(specular, hw),
            ]
            return predict_brdf(brdf1_nets, bp, im, extra)

        jit_brdf1 = functools.partial(jax.jit(_cascade1), bp1_)
        jit_light1 = functools.partial(
            jax.jit(
                lambda lp, im, preds, im_small, fov, env_pre:
                predict_light_core(
                    light1_nets, lp, im, preds, im_small, fov, env_pre,
                    use_pallas=use_pallas,
                ),
                static_argnums=(4,),
            ),
            lp1_,
        )
    bs_params = load_bs_params(opt) if opt.isBS else None
    if bs_params is not None:
        bs_params = jax.device_put(bs_params)
    jit_bs = make_bs_fn(bs_params, opt.vMax)

    for im_path in im_list:
        name = osp.splitext(osp.basename(im_path))[0]
        im, im_small, fov = load_real_image(
            im_path, (opt.imHeight, opt.imWidth), (opt.envRow, opt.envCol)
        )
        im = jnp.asarray(im)
        im_small = jnp.asarray(im_small)

        # cascade 0
        preds = jit_brdf0(im)
        all_preds = [preds]
        light_out = None
        if opt.isLight or opt.level == 2:
            light_out = predict_light(jit_light0(im, preds, im_small, fov))

        # cascade 1
        if opt.level == 2:
            preds = jit_brdf1(
                im, preds, light_out["diffuse"], light_out["specular"]
            )
            all_preds.append(preds)
            if opt.isLight:
                light_out = predict_light(
                    jit_light1(im, preds, im_small, fov,
                               light_out["sg_flat"])
                )

        # bilateral refinement
        bs_out = jit_bs(im, preds) if opt.isBS else None

        # write products
        def out(n):
            return osp.join(opt.output, n)

        final = all_preds[-1]
        lvl = len(all_preds) - 1
        # the cAlbedo global-scale disambiguation applies to the saved
        # albedo (testReal.py:546-549)
        c_albedo = light_out["c_albedo"] if light_out is not None else 1.0
        albedo_out = np.asarray(final["albedo"][0]) * c_albedo
        np.save(out(f"{name}_albedo{lvl}.npy"), albedo_out)
        np.save(out(f"{name}_normal{lvl}.npy"), np.asarray(final["normal"][0]))
        np.save(out(f"{name}_rough{lvl}.npy"), np.asarray(final["rough"][0]))
        np.save(out(f"{name}_depth{lvl}.npy"), np.asarray(final["depth"][0]))
        write_image(
            albedo_out, out(f"{name}_albedo{lvl}.png"), gamma=True,
        )
        write_image(
            np.asarray(0.5 * (final["normal"][0] + 1.0)),
            out(f"{name}_normal{lvl}.png"),
        )
        write_image(
            np.asarray(0.5 * (final["rough"][0] + 1.0)),
            out(f"{name}_rough{lvl}.png"),
        )
        d = np.asarray(final["depth"][0])
        write_image(1 / np.clip(d, 0.1, None) * 0.3,
                    out(f"{name}_depth{lvl}.png"))
        if light_out is not None:
            np.savez_compressed(
                out(f"{name}_env{lvl}.npz"),
                data=np.asarray(light_out["env_img"][0]),
            )
            np.save(out(f"{name}_sg{lvl}.npy"),
                    np.asarray(light_out["sg_flat"][0]))
            write_envmap_mosaic(
                np.asarray(light_out["env_img"][0]),
                out(f"{name}_envmap{lvl}.png"),
                env_height=opt.envHeight, env_width=opt.envWidth,
            )
            rendered = np.asarray(
                (light_out["diffuse"] + light_out["specular"])[0]
            )
            write_image(rendered, out(f"{name}_rendered{lvl}.png"), gamma=True)
            # SG -> diffuse shading visualization (testReal.py:656-660 via
            # utils.predToShading)
            from inverserenderingofindoorscene_tpu.utils.io import (
                pred_to_shading,
            )

            shading = pred_to_shading(
                np.asarray(light_out["sg_flat"][0]), sg_num=opt.SGNum
            )
            write_image(
                np.clip(shading / max(shading.max(), 1e-10), 0, 1),
                out(f"{name}_shading{lvl}.png"), gamma=True,
            )
            np.save(
                out(f"{name}_cLight{lvl}.npy"),
                np.array([light_out["c_albedo"], light_out["c_light"]]),
            )
            # .mat export for the reference's downstream comparison tooling
            # (testReal.py:646 writes scipy.io.savemat {'cLight': ...})
            try:
                from scipy.io import savemat

                savemat(
                    out(f"{name}_cLight{lvl}.mat"),
                    {
                        "cLight": np.asarray(light_out["c_light"]),
                        "cAlbedo": np.asarray(light_out["c_albedo"]),
                    },
                )
            except ImportError:
                print("scipy unavailable; skipped .mat cLight export")
        if bs_out is not None:
            write_image(np.asarray(bs_out["albedo"][0]) * c_albedo,
                        out(f"{name}_albedoBs{lvl}.png"), gamma=True)
            write_image(np.asarray(0.5 * (bs_out["rough"][0] + 1)),
                        out(f"{name}_roughBs{lvl}.png"))
            np.save(out(f"{name}_depthBs{lvl}.npy"),
                    np.asarray(bs_out["depth"][0]))
        print(f"done {im_path} -> {opt.output}/{name}_*")


if __name__ == "__main__":
    main()
