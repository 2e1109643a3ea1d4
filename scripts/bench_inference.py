"""End-to-end inference throughput: the full testReal chain on one chip.

Times the steady-state (post-compile) per-image latency of the complete
in-the-wild pipeline at the reference operating point (landscape
240x320 image, 120x160 lighting grid, SG12, fov 57):

  cascade-0 BRDF -> light 0 (SG decode + render + scale fit) ->
  cascade-1 BRDF (17ch) -> light 1 (with env_pre) ->
  bilateral refinement of albedo/rough/depth

i.e. exactly what cli/test_real.py runs per image
(/root/reference/testReal.py:356-540), minus disk I/O and the
host-side cLight branching (which is O(scalars)).  Random weights —
latency does not depend on the parameter values.

Usage: python scripts/bench_inference.py [--no-bs] [--iters N]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def fence(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-bs", action="store_true")
    ap.add_argument("--v-max", default="full",
                    help="bilateral vertex capacity: 'full', 'auto', or int")
    ap.add_argument("--use-pallas", action="store_true")
    ap.add_argument("--ab", action="store_true",
                    help="compile BOTH the jnp and pallas chains and time "
                         "them interleaved in one process (tunnel drift "
                         "is hour-scale; cross-process A/Bs are unsafe)")
    ap.add_argument("--fused", action="store_true",
                    help="one whole-chain XLA program (InverseRenderer "
                         "fused=True, cLight branch traced as jnp.where) "
                         "instead of per-stage programs")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1,
                    help="images per batch (same-aspect batching; the "
                         "reference driver is strictly B1)")
    ap.add_argument("--imHeight", type=int, default=240)
    ap.add_argument("--imWidth", type=int, default=320)
    opt = ap.parse_args()

    from inverserenderingofindoorscene_tpu.pipeline.inference import (
        make_bs_fn,
        predict_brdf,
        predict_light_core,
    )
    from inverserenderingofindoorscene_tpu.core.imageops import (
        adaptive_avg_pool,
        resize_bilinear,
    )
    from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
    from inverserenderingofindoorscene_tpu.pipeline.light import LightNets

    h, w = opt.imHeight, opt.imWidth
    er, ec = h // 2, w // 2  # 120x160 lighting grid at the reference point
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    stacks = []
    use_pallas = opt.use_pallas
    for lvl in range(2):
        brdf = BRDFNets(cascade_level=lvl, compute_dtype=opt.dtype)
        light = LightNets(cascade_level=lvl, env_rows=er, env_cols=ec,
                          compute_dtype=opt.dtype)
        stacks.append(
            (brdf, brdf.init(ks[2 * lvl], (h, w)),
             light, light.init(ks[2 * lvl + 1], (er * 4, ec * 4)))
        )
    (b0, bp0, l0, lp0), (b1, bp1, l1, lp1) = stacks

    fov = 57.0

    # Staged mode: one jit per stage, exactly like cli/test_real.py — the
    # per-stage split is what the staged driver runs.  Stages chain
    # asynchronously; only the final fetch synchronizes.  Params are jit
    # ARGUMENTS (closed-over arrays embed as HLO constants and blow the
    # remote compile service's request size limit, HTTP 413).
    def make_stages(use_pallas):
        @jax.jit
        def stage0(bp, lp, im):
            im_small = adaptive_avg_pool(im, (er, ec))
            preds0 = predict_brdf(b0, bp, im)
            light0 = predict_light_core(l0, lp, im, preds0, im_small, fov,
                                        use_pallas=use_pallas)
            return im_small, preds0, light0

        @jax.jit
        def stage1(bp, lp, im, im_small, preds0, light0):
            hw = im.shape[1:3]
            extra = [
                resize_bilinear(preds0["albedo"], hw),
                0.5 * (resize_bilinear(preds0["normal"], hw) + 1.0),
                0.5 * (resize_bilinear(preds0["rough"], hw) + 1.0),
                resize_bilinear(preds0["depth"], hw),
                resize_bilinear(light0["diffuse"], hw),
                resize_bilinear(light0["specular"], hw),
            ]
            preds1 = predict_brdf(b1, bp, im, extra)
            light1 = predict_light_core(
                l1, lp, im, preds1, im_small, fov, env_pre=light0["sg_flat"],
                use_pallas=use_pallas,
            )
            return preds1, light1

        return stage0, stage1

    stage0, stage1 = make_stages(use_pallas)

    if opt.fused:
        from inverserenderingofindoorscene_tpu.pipeline.inference import (
            InverseRenderer,
        )

        renderer = InverseRenderer(
            stacks, is_light=True, is_bs=not opt.no_bs, v_max=opt.v_max,
            use_pallas=use_pallas, fused=True,
        )

        @jax.jit
        def _small(im):
            return adaptive_avg_pool(im, (er, ec))

        def chain(im):
            out = renderer(im, _small(im), fov)
            return {"preds": out["preds"][-1], "env": out["light"]["env_img"],
                    "sg": out["light"]["sg_flat"],
                    **({"refined": out["refined"]} if not opt.no_bs else {})}
    else:
        jit_bs = make_bs_fn(None, opt.v_max)
        bp0, lp0, bp1, lp1 = jax.device_put((bp0, lp0, bp1, lp1))

        def chain(im):
            im_small, preds0, light0 = stage0(bp0, lp0, im)
            preds1, light1 = stage1(bp1, lp1, im, im_small, preds0, light0)
            out = {"preds": preds1, "env": light1["env_img"],
                   "sg": light1["sg_flat"]}
            if not opt.no_bs:
                out["refined"] = jit_bs(im, preds1)
            return out

    # Photo-like input: piecewise-smooth base + mild texture.  Conv/light
    # latency is input-independent, but the bilateral stage's auto
    # capacity is data-dependent — per-pixel noise (which no real photo
    # resembles) forces the worst-case one-vertex-per-pixel grid, while a
    # smooth image exercises the representative buckets.
    rng_np = np.random.RandomState(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [xx / w, yy / h, 0.5 + 0.3 * np.sin(xx / 40.0) * np.cos(yy / 30.0)],
        axis=-1,
    )
    im_np = np.clip(base + rng_np.randn(h, w, 3) * 0.015, 0.0, 1.0)
    im = jnp.asarray(
        np.broadcast_to(im_np, (opt.batch, h, w, 3)), jnp.float32
    )
    if opt.ab:
        assert not opt.fused, "--ab runs the staged chain"
        variants = []
        for tag_p, up in (("jnp", False), ("pallas", True)):
            s0, s1 = make_stages(up)

            def mk(s0, s1):
                def ch(im):
                    im_small, preds0, light0 = s0(bp0, lp0, im)
                    preds1, light1 = s1(bp1, lp1, im, im_small, preds0,
                                        light0)
                    out = {"preds": preds1, "env": light1["env_img"],
                           "sg": light1["sg_flat"]}
                    if not opt.no_bs:
                        out["refined"] = jit_bs(im, preds1)
                    return out
                return ch

            ch = mk(s0, s1)
            print(f"compiling {tag_p} chain ...", flush=True)
            t0 = time.time()
            fence(ch(im))
            print(f"  compiled in {time.time() - t0:.0f} s", flush=True)
            variants.append((tag_p, ch))
        res = {}
        for rnd in range(3):
            for tag_p, ch in variants:
                t0 = time.perf_counter()
                out = None
                for _ in range(opt.iters):
                    out = ch(im)
                fence(out)
                ms = (time.perf_counter() - t0) / opt.iters / opt.batch * 1e3
                res.setdefault(tag_p, []).append(ms)
        for tag_p, mss in res.items():
            print(f"A/B B{opt.batch} {opt.dtype} staged no-bs={opt.no_bs} "
                  f"{tag_p:7s}: min {min(mss):7.1f} ms/image "
                  f"(runs: {' '.join(f'{m:.1f}' for m in mss)})", flush=True)
        return


    t0 = time.time()
    print("compiling the full chain ...", flush=True)
    out0 = chain(im)
    fence(out0)
    print(f"compiled in {time.time() - t0:.0f} s; timing ...", flush=True)
    if not opt.no_bs and opt.v_max == "auto":
        from inverserenderingofindoorscene_tpu.pipeline.inference import bs_prep
        from inverserenderingofindoorscene_tpu.ops.bilateral import (
            MODE_PARAMS,
            bucket_capacity,
            count_vertices,
        )

        @jax.jit
        def _counts(i, p):
            g, _, _ = bs_prep(i, p, None)
            return jnp.stack(
                [jnp.max(count_vertices(g, MODE_PARAMS[m]))
                 for m in (0, 2, 4)]
            )

        nvs = [int(v) for v in np.asarray(_counts(im, out0["preds"]))]
        caps = [bucket_capacity(n, h * w) for n in nvs]
        print(f"auto vMax: nvert={nvs} -> buckets={caps} (of {h * w})",
              flush=True)
    fence(chain(im))
    t0 = time.perf_counter()
    out = None
    for _ in range(opt.iters):
        out = chain(im)
    fence(out)
    ms = (time.perf_counter() - t0) / opt.iters / opt.batch * 1e3
    tag = ("full chain (2 cascades + light + BS)" if not opt.no_bs else
           "2 cascades + light (no BS)")
    tag += f" [B{opt.batch} {opt.dtype}{', pallas' if use_pallas else ''}"
    tag += ", fused" if opt.fused else ""
    if not opt.no_bs:
        tag += f", vMax={opt.v_max}"
    tag += "]"
    print(f"{tag}: {ms:.1f} ms/image  ({1e3 / ms:.2f} images/s/chip)",
          flush=True)


if __name__ == "__main__":
    main()
