"""In-the-wild two-cascade inference as a library API (testReal.py chain).

The reference exposes this flow only as a script (/root/reference/
testReal.py:285-660); here it is a composable API: stage functions
(:func:`predict_brdf`, :func:`predict_light_core`, :func:`refine_bs`)
plus :class:`InverseRenderer`, which owns the jit plumbing (per-stage
programs with weights passed as arguments — closed-over trees embed as
HLO constants and overflow the remote compile service's request limit)
and runs image -> albedo/normal/rough/depth/lighting in one call.
`cli.test_real` is a thin driver over this module.
"""

from __future__ import annotations

import functools

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
from inverserenderingofindoorscene_tpu.pipeline.light import (
    light_input_from_preds,
    mean_normalize,
)


def load_real_image(path, im_hw, env_rc, return_original=False):
    """Aspect-preserving resize + fov selection (testReal.py:290-343).

    Returns (im [1,h,w,3] linear, im_small [1,eh,ew,3], fov_deg); with
    ``return_original`` also the unresized uint8 RGB photo (the
    reference writes it back out as a product, testReal.py:659-660)."""
    import cv2

    im_cpu = cv2.imread(path)
    assert im_cpu is not None, path
    im_cpu = im_cpu[:, :, ::-1]
    nh, nw = im_cpu.shape[:2]

    def fit_dims(nh0, nw0, max_h, max_w):
        if nh0 < nw0:
            w = max_w
            h = int(float(max_w) / nw0 * nh0)
        else:
            h = max_h
            w = int(float(max_h) / nh0 * nw0)
        return h, w

    def resize_gamma(h, w, ref_h):
        # reference quirk kept for parity (testReal.py:306-309): INTER_AREA
        # when UPSCALING (ref_h < h), INTER_LINEAR when downscaling
        interp = cv2.INTER_AREA if ref_h < h else cv2.INTER_LINEAR
        out = cv2.resize(im_cpu, (w, h), interpolation=interp)
        out = out.astype(np.float32) / 255.0
        out = out / out.max()
        return (out ** 2.2)[None]

    h0, w0 = fit_dims(nh, nw, *im_hw)
    im = resize_gamma(h0, w0, nh)
    # the env-resolution fit runs AFTER `nh, nw = newImHeight[-1],
    # newImWidth[-1]` in the reference (testReal.py:318): its target size,
    # its interp-quirk check, and the fov orientation all use the LAST
    # LEVEL's resized dims, not the original photo's
    eh, ew = fit_dims(h0, w0, *env_rc)
    im_small = resize_gamma(eh, ew, h0)
    fov = 57.0 if h0 < w0 else 42.75
    if return_original:
        return im, im_small, fov, im_cpu
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
            render_sg_env,
        )

        interp = jax.default_backend() != "tpu"
        lamb = sg.unsquash(lamb01)
        weight = sg.unsquash(weight01)
        # ONE fused kernel: decode + shade + envmap product — the SG
        # mixture is evaluated once (the train path launches the
        # custom-VJP render_sg/sg_envmap pair instead, which re-does it,
        # because it needs gradients)
        diffuse, specular, env_img = render_sg_env(
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
        # per-image max: [B] (identical to the global max at the
        # reference driver's B=1; keeps batched serving scales separate)
        "albedo_max": jnp.max(
            preds["albedo"], axis=tuple(range(1, preds["albedo"].ndim))
        ),
    }


def predict_light(core_out, cascade=0):
    """cLight/cAlbedo global-scale disambiguation (testReal.py:421-432) —
    Python branching on concrete values, applied to a jitted core output.
    Batch-1 only, like the reference driver; batched serving goes through
    :func:`predict_light_traced` (fused mode), whose fit is per-image.

    ``cascade`` selects the degenerate-specular threshold: the reference
    uses ``cSpec < 1e-3`` at cascade 0 (testReal.py:421) but ``cSpec == 0``
    at cascade 1 (testReal.py:517) — mirrored here as ``<= 0`` (the
    specular sums are non-negative, so the two are equivalent)."""
    c_diff = float(
        jnp.sum(core_out["diffuse"]) / jnp.sum(core_out["diffuse_raw"])
    )
    c_spec = float(
        jnp.sum(core_out["specular"]) / jnp.sum(core_out["specular_raw"])
    )
    albedo_max = float(core_out["albedo_max"].reshape(-1)[0])
    if (c_spec < 1e-3) if cascade == 0 else (c_spec <= 0.0):
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


def predict_light_traced(core_out, cascade=0):
    """Traceable cLight/cAlbedo disambiguation (testReal.py:421-432).

    Same math as :func:`predict_light` but with the data-dependent branch
    as ``jnp.where``, so the WHOLE two-cascade chain can compile into one
    XLA program (no host round-trip mid-chain).  Both reference branches
    end at ``c_light = c_diff / c_albedo``; only ``c_albedo`` differs:
    the upper clip bound when the specular fit is degenerate, the clipped
    ratio otherwise.  The degenerate branch's discarded ratio can be
    inf/nan; ``jnp.where`` never selects it and nothing differentiates
    through this, so it is inert.

    Unlike the host version (and the strictly-batch-1 reference driver),
    the fit is PER IMAGE — ``c_albedo``/``c_light`` are [B] — so batched
    serving does not mix scale factors across images; at B=1 the two are
    identical."""
    axes = tuple(range(1, core_out["diffuse"].ndim))
    c_diff = (
        jnp.sum(core_out["diffuse"], axes)
        / jnp.sum(core_out["diffuse_raw"], axes)
    )
    c_spec = (
        jnp.sum(core_out["specular"], axes)
        / jnp.sum(core_out["specular_raw"], axes)
    )
    ca_hi = 1.0 / core_out["albedo_max"]
    # per-cascade degenerate threshold, like predict_light: the
    # reference branches on < 1e-3 at cascade 0 but == 0 at cascade 1
    degenerate = (c_spec < 1e-3) if cascade == 0 else (c_spec <= 0.0)
    c_albedo = jnp.where(
        degenerate, ca_hi, jnp.clip(c_diff / c_spec, 1e-3, ca_hi)
    )
    c_light = c_diff / c_albedo
    env = core_out["env_img"]
    return {
        "sg_flat": core_out["sg_flat"],
        "env_img": env * c_light.reshape((-1,) + (1,) * (env.ndim - 1)),
        "diffuse": core_out["diffuse"],
        "specular": core_out["specular"],
        "c_albedo": c_albedo,
        "c_light": c_light,
    }


def bs_prep(im, preds, bs_params=None):
    """The jittable prefix of the refinement: max-normalized guide
    (BilateralLayer.py:250-253), per-mode targets and confidences (trained
    CNNs when a checkpoint is available, unit confidence otherwise).
    Returns (guide, targets dict, confs dict)."""
    from inverserenderingofindoorscene_tpu.pipeline.bilateral import (
        normalized_guide,
    )

    h, w = im.shape[1:3]
    # ONE implementation of the parity-sensitive guide clamp for
    # training and inference (per-image max, identical at the reference
    # driver's B=1, BilateralLayer.py:250-253)
    guide = normalized_guide(preds["albedo"])
    targets = {
        "albedo": preds["albedo"],
        "rough": 0.5 * (preds["rough"] + 1.0),
        "depth": preds["depth"],
    }
    if bs_params is None:
        ones = jnp.ones((im.shape[0], h, w, 1), jnp.float32)
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
    case). Exact smaller capacities: see BucketedSolver / v_max='auto'."""
    h, w = im.shape[1:3]
    v_max = v_max or (h * w)
    guide, targets, confs = bs_prep(im, preds, bs_params)
    out = {
        k: bilateral_solve(guide, targets[k], confs[k], MODE_PARAMS[m], v_max)
        for k, m in _BS_MODES
    }
    out["rough"] = jnp.clip(2.0 * out["rough"] - 1.0, -1.0, 1.0)
    return out


def make_bs_fns(bs_params_list, v_max_opt):
    """Per-level refinement callables SHARING their compiled programs.

    The reference builds BS nets per cascade level with per-level
    checkpoints and refines every level's predictions
    (testReal.py:184-202, 532-540); the solve programs are identical
    across levels, so one jit wrapper / one BucketedSolver serves all of
    them and only the confidence-CNN weights differ per level (passed as
    jit arguments).  ``bs_params_list`` entries may be None (unit
    confidence).

    v_max_opt: "full" (one vertex per pixel), "auto" (count the guide's
    occupied cells, dispatch to a ladder-bucketed compile — exact, but far
    fewer gather/sort rows on smooth guides), or an int capacity."""
    if v_max_opt != "auto":
        v_max = None if v_max_opt == "full" else int(v_max_opt)
        jit_bs = jax.jit(
            lambda bsp, im, preds: refine_bs(im, preds, bsp, v_max)
        )
        return [functools.partial(jit_bs, bsp) for bsp in bs_params_list]

    from inverserenderingofindoorscene_tpu.ops.bilateral import (
        BucketedSolver,
    )

    jit_prep = jax.jit(lambda bsp, im, preds: bs_prep(im, preds, bsp))
    post_rough = jax.jit(lambda x: jnp.clip(2.0 * x - 1.0, -1.0, 1.0))
    solver = BucketedSolver()
    mode_params = tuple(MODE_PARAMS[m] for _, m in _BS_MODES)

    def make(bsp):
        def bs_fn(im, preds):
            guide, targets, confs = jit_prep(bsp, im, preds)
            nv = solver.counts(guide, mode_params)
            keys = [k for k, _ in _BS_MODES]
            outs = solver.solve_many(
                guide, [targets[k] for k in keys],
                [confs[k] for k in keys], mode_params, nv,
            )
            out = dict(zip(keys, outs))
            out["rough"] = post_rough(out["rough"])
            return out

        return bs_fn

    return [make(bsp) for bsp in bs_params_list]


def make_bs_fn(bs_params, v_max_opt):
    """Single-level variant of :func:`make_bs_fns`."""
    return make_bs_fns([bs_params], v_max_opt)[0]


def _cascade1_extra(im, preds, diffuse, specular):
    """Cascade-1 encoder extra channels: the cascade-0 maps and rendered
    components upsampled to image resolution (testReal.py:438-452)."""
    hw = im.shape[1:3]
    return [
        resize_bilinear(preds["albedo"], hw),
        0.5 * (resize_bilinear(preds["normal"], hw) + 1.0),
        0.5 * (resize_bilinear(preds["rough"], hw) + 1.0),
        resize_bilinear(preds["depth"], hw),
        resize_bilinear(diffuse, hw),
        resize_bilinear(specular, hw),
    ]


class InverseRenderer:
    """Single-image inverse rendering as one call (the testReal chain).

    Wraps the two-cascade BRDF + lighting stacks and the bilateral
    refinement behind jitted per-stage programs.  Weights are passed as
    jit ARGUMENTS (closed-over trees embed as HLO constants, inflating
    and eventually overflowing remote compile requests) and live on
    device across calls.  Stages recompile once per unique image aspect.

    ``fused=True`` compiles the whole BRDF->light->BRDF->light chain
    into ONE XLA program instead of four, with the cLight/cAlbedo
    disambiguation traced as ``jnp.where`` (:func:`predict_light_traced`)
    instead of Python host branching: one dispatch and one device sync
    per image.  The bilateral refinement stays a separate program (its
    exact auto-capacity dispatch needs a host read of the counted
    vertices).

    Example::

        stacks = load_stack(opt)            # cli.test_real checkpoint I/O
        r = InverseRenderer(stacks, is_light=True, is_bs=True)
        out = r.render_file("photo.png")
        out["preds"][-1]["albedo"]          # final-cascade predictions
        out["light"]["env_img"]             # final per-pixel envmaps
        out["lights"][0]["env_img"]         # cascade-0 envmaps
        out["refined"][-1]["albedo"]        # final bilateral-refined maps

    ``stacks``: [(BRDFNets, brdf_params, LightNets, light_params)] per
    cascade. ``bs_params``: confidence-CNN params — one tree per level
    (list, entries may be None for unit confidence) or a single tree
    applied to every level, mirroring the reference's per-level BS nets
    (testReal.py:184-202). ``v_max``: bilateral vertex capacity
    ("auto"/"full"/int, see :func:`make_bs_fns`).
    """

    def __init__(self, stacks, *, is_light=True, is_bs=False,
                 bs_params=None, v_max="auto", use_pallas=False,
                 fused=False, param_sharding=None):
        self.level = len(stacks)
        assert self.level in (1, 2), self.level
        # At level 2 lighting runs at every level like the reference's
        # testReal cascade loop (its isLight flag only gates saving) and
        # is_light gates which PRODUCTS callers write; at level 1,
        # is_light=False is the BRDF-only fast path (no light compute,
        # batched calls allowed).
        self.is_light = is_light
        self.is_bs = is_bs
        self.fused = fused

        nets = [(s[0], s[2]) for s in stacks]
        # param_sharding: e.g. parallel.mesh.replicated(mesh) for
        # data-parallel serving — GSPMD then shards the chain over the
        # mesh from the inputs' shardings alone
        _put = (
            (lambda p: jax.device_put(p, param_sharding))
            if param_sharding is not None else jax.device_put
        )
        params = tuple(_put(p) for s in stacks for p in (s[1], s[3]))
        self._nets = nets
        self._params = params
        self._use_pallas = use_pallas
        if fused:
            self._chain = functools.partial(
                jax.jit(
                    lambda ps, im, im_small, fov: self._run_chain(
                        nets, ps, im, im_small, fov, use_pallas,
                        predict_light_traced,
                    ),
                    static_argnums=(3,),
                ),
                params,
            )
        else:
            brdf0_nets, light0_nets = nets[0]
            bp0, lp0 = params[0], params[1]
            self._brdf0 = functools.partial(
                jax.jit(lambda bp, im: predict_brdf(brdf0_nets, bp, im)),
                bp0,
            )
            # off-TPU the kernels run in interpret mode (slow but correct),
            # so the flag alone decides — which also lets CPU tests cover
            # the branch
            self._light0 = functools.partial(
                jax.jit(
                    lambda lp, im, preds, im_small, fov: predict_light_core(
                        light0_nets, lp, im, preds, im_small, fov,
                        use_pallas=use_pallas,
                    ),
                    static_argnums=(4,),
                ),
                lp0,
            )
            if self.level == 2:
                brdf1_nets, light1_nets = nets[1]
                bp1, lp1 = params[2], params[3]

                def _cascade1(bp, im, preds, diffuse, specular):
                    extra = _cascade1_extra(im, preds, diffuse, specular)
                    return predict_brdf(brdf1_nets, bp, im, extra)

                self._brdf1 = functools.partial(jax.jit(_cascade1), bp1)
                self._light1 = functools.partial(
                    jax.jit(
                        lambda lp, im, preds, im_small, fov, env_pre:
                        predict_light_core(
                            light1_nets, lp, im, preds, im_small, fov,
                            env_pre, use_pallas=use_pallas,
                        ),
                        static_argnums=(4,),
                    ),
                    lp1,
                )
        if is_bs:
            if isinstance(bs_params, (list, tuple)):
                bs_list = list(bs_params)
                assert len(bs_list) == self.level, (len(bs_list), self.level)
            else:
                bs_list = [bs_params] * self.level
            bs_list = [
                jax.device_put(p) if p is not None else None for p in bs_list
            ]
            self._bs_fns = make_bs_fns(bs_list, v_max)

    def _run_chain(self, nets, params, im, im_small, fov, use_pallas,
                   light_post):
        """The full chain with pluggable scale disambiguation:
        :func:`predict_light_traced` when jitted whole (fused), the
        identity when the caller applies :func:`predict_light` on host."""
        # Lighting gates mirror the reference exactly: cascade-0 light
        # runs when `isLight or level == 2` (testReal.py:382 — level 2
        # always needs it for the cascade-1 diffuse/specular inputs),
        # cascade-1 light ONLY when `level == 2 and isLight`
        # (testReal.py:475) — without --isLight the reference computes
        # one cAlbedo and saves the cascade-1 albedo UNSCALED
        # (testReal.py:546-549's `n < len(cAlbedos)` guard, which
        # cli/test_real.py mirrors with its `lvl < len(scales)` default).
        brdf0_nets, light0_nets = nets[0]
        preds = predict_brdf(brdf0_nets, params[0], im)
        all_preds = [preds]
        lights = []
        if self.is_light or self.level == 2:
            lights.append(light_post(predict_light_core(
                light0_nets, params[1], im, preds, im_small, fov,
                use_pallas=use_pallas,
            ), cascade=0))
        if self.level == 2:
            brdf1_nets, light1_nets = nets[1]
            extra = _cascade1_extra(
                im, preds, lights[0]["diffuse"], lights[0]["specular"]
            )
            preds = predict_brdf(brdf1_nets, params[2], im, extra)
            all_preds.append(preds)
            if self.is_light:
                lights.append(light_post(predict_light_core(
                    light1_nets, params[3], im, preds, im_small, fov,
                    lights[0]["sg_flat"], use_pallas=use_pallas,
                ), cascade=1))
        return {
            "preds": all_preds,
            "lights": lights,
            "light": lights[-1] if lights else None,
        }

    def __call__(self, im, im_small, fov=57.0):
        """Run the chain on a staged image.

        im [1,H,W,3] linear RGB in 0..1; im_small [1,eh,ew,3] (the
        lighting-grid resize of the same photo); fov in degrees.
        Returns {"preds": [per-cascade pred dicts], "lights": [per-level
        light dicts — at level 2 lighting runs at every level mirroring
        testReal; empty only for the level-1 BRDF-only fast path],
        "light": the final level's light dict or None, "refined":
        [per-level refined dicts] or None — every cascade level is
        refined with its own BS params like the reference
        (testReal.py:532-540)}."""
        if self.fused:
            out = self._chain(im, im_small, fov)
            all_preds, lights = out["preds"], out["lights"]
            light_out = out["light"]
        else:
            if (self.is_light or self.level == 2) and im.shape[0] != 1:
                raise ValueError(
                    "staged mode fits one global cLight/cAlbedo scale "
                    "(the reference driver's strictly-B1 semantics); use "
                    "fused=True for batched serving with per-image scales"
                )
            preds = self._brdf0(im)
            all_preds = [preds]
            # lighting gates mirror testReal exactly (see _run_chain):
            # light0 when isLight or level 2, light1 only with isLight
            lights = []
            if self.is_light or self.level == 2:
                lights.append(predict_light(
                    self._light0(im, preds, im_small, fov),
                    cascade=0,
                ))
            if self.level == 2:
                preds = self._brdf1(
                    im, preds, lights[0]["diffuse"], lights[0]["specular"]
                )
                all_preds.append(preds)
                if self.is_light:
                    lights.append(predict_light(
                        self._light1(im, preds, im_small, fov,
                                     lights[0]["sg_flat"]),
                        cascade=1,
                    ))
            light_out = lights[-1] if lights else None
        bs_out = (
            [fn(im, p) for fn, p in zip(self._bs_fns, all_preds)]
            if self.is_bs else None
        )
        return {
            "preds": all_preds,
            "lights": lights,
            "light": light_out,
            "refined": bs_out,
        }

    def render_file(self, path, im_hw=(240, 320), env_rc=(120, 160)):
        """Load a photo from disk (aspect-preserving resize, gamma to
        linear, fov by orientation) and run the chain."""
        im, im_small, fov = load_real_image(path, im_hw, env_rc)
        return self(jnp.asarray(im), jnp.asarray(im_small), fov)

    def serialize(self, im_hw, env_rc, fov=57.0, batch=1):
        """AOT-export the fused chain as a portable StableHLO artifact.

        Returns ``(blob, params)``: ``blob`` is ``bytes`` (the
        ``jax.export`` serialization of the whole BRDF/light chain at the
        given static shapes) and ``params`` the weight pytree the artifact
        takes as its first argument.  Deployment needs only the two —
        :func:`deserialize_chain` (or any StableHLO consumer) serves the
        model without this package's model code.  Requires ``fused=True``
        (the artifact is one program by construction).  The default jnp
        compute path exports portably; ``use_pallas`` would embed
        TPU-only Mosaic custom calls."""
        assert self.fused, "serialize requires fused=True"
        from jax import export as jexport

        nets, use_pallas = self._nets, self._use_pallas

        def fn(ps, im, im_small):
            return self._run_chain(
                nets, ps, im, im_small, fov, use_pallas,
                predict_light_traced,
            )

        pspec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self._params
        )
        im_spec = jax.ShapeDtypeStruct((batch, *im_hw, 3), jnp.float32)
        small_spec = jax.ShapeDtypeStruct((batch, *env_rc, 3), jnp.float32)
        exported = jexport.export(jax.jit(fn))(pspec, im_spec, small_spec)
        return bytes(exported.serialize()), self._params


def deserialize_chain(blob):
    """Rehydrate a :meth:`InverseRenderer.serialize` artifact.

    Returns a jitted callable ``(params, im, im_small) -> {"preds", "light"}``
    with the same output pytree as the fused chain."""
    from jax import export as jexport

    return jax.jit(jexport.deserialize(blob).call)


__all__ = [
    "InverseRenderer",
    "deserialize_chain",
    "load_real_image",
    "predict_brdf",
    "predict_light_core",
    "predict_light",
    "predict_light_traced",
    "bs_prep",
    "refine_bs",
    "make_bs_fn",
    "make_bs_fns",
]
