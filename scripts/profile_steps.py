"""Train-step profiling at the reference operating points (VERDICT r1 #7).

Times the BRDF and light train steps on the real chip, reports XLA's own
FLOP count and the achieved MXU fraction, and attributes device time by
op category from a jax.profiler trace.

Usage: python scripts/profile_steps.py [--stage brdf|light|both]
       [--dtype float32|bfloat16|both] [--trace]
"""
import argparse
import glob
import sys

sys.path.insert(0, "/root/repo")
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp


def log(m):
    print(m, flush=True)


def fence(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def timeit(fn, *args, iters=10):
    fence(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters * 1e3


# v5e peaks (public figures): bf16 MXU 197 TFLOP/s; f32 runs through the
# MXU at ~1/4 bf16 via passes (approx 49 TFLOP/s effective upper bound).
MXU_PEAK = {"bfloat16": 197e12, "float32": 49e12}


def photo_like(batch, h, w):
    """Replace the random synthetic images with a piecewise-smooth
    photo-like input (bench_inference's recipe): per-pixel noise is the
    bilateral grid's worst case, which no real photo resembles."""
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [xx / w, yy / h, 0.5 + 0.3 * np.sin(xx / 40.0) * np.cos(yy / 30.0)],
        axis=-1,
    )
    im = np.clip(base + rng.randn(h, w, 3) * 0.015, 0.0, 1.0)
    b = batch["im"].shape[0]
    batch = dict(batch)
    batch["im"] = jnp.asarray(
        np.broadcast_to(im, (b, h, w, 3)), batch["im"].dtype
    )
    return batch


def build_step(stage, dtype, cascade=0, v_max="full", photo=False,
               batch_size=None):
    """batch_size=None keeps each stage's reference operating point
    (brdf 16, light 5, bilateral 2); override it to measure how the
    glue-bound steps amortize per-op fixed costs at larger batches."""
    from inverserenderingofindoorscene_tpu.data.synthetic import synthetic_batch
    from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
    from inverserenderingofindoorscene_tpu.pipeline.light import LightNets
    from inverserenderingofindoorscene_tpu.train.steps import (
        create_train_state,
        make_brdf_train_step,
        make_light_train_step,
        reference_adam,
    )

    if stage == "brdf":
        nets = BRDFNets(cascade_level=cascade, compute_dtype=dtype)
        params = nets.init(jax.random.PRNGKey(0), (240, 320))
        batch = synthetic_batch(
            batch=16 if batch_size is None else batch_size,
            im_hw=(240, 320), env_rc=(120, 160), cascade_level=cascade)
        step = jax.jit(make_brdf_train_step(nets), donate_argnums=(0,))
        state = create_train_state(params, reference_adam(1e-4))
        return step, state, batch
    if stage == "bilateral":
        from inverserenderingofindoorscene_tpu.pipeline.bilateral import (
            BilateralNets,
        )
        from inverserenderingofindoorscene_tpu.train.steps import (
            make_bilateral_train_step,
        )

        # reference operating point: batch 2 at 240x320
        # (trainBRDFBilateral.py:27-28)
        brdf_nets = BRDFNets(cascade_level=cascade, compute_dtype=dtype)
        bs_nets = BilateralNets()
        bp = brdf_nets.init(jax.random.PRNGKey(0), (240, 320))
        sp = bs_nets.init(jax.random.PRNGKey(1), (240, 320))
        batch = synthetic_batch(
            batch=2 if batch_size is None else batch_size,
            im_hw=(240, 320), env_rc=(120, 160), cascade_level=cascade)
        if photo:
            batch = photo_like(batch, 240, 320)
        state = create_train_state(sp, reference_adam(1e-4))
        if v_max == "auto":
            # the capacities the CLI's auto dispatch would pick for THIS
            # batch: count occupied grid cells on the frozen-BRDF guide,
            # then resolve the edge bucket exactly like the CLI (guess
            # 2*nvert, run once, bump to the step's reported nedges_max)
            from inverserenderingofindoorscene_tpu.ops.bilateral import (
                MODE_PARAMS,
                bucket_capacity,
                count_vertices,
                edge_bucket,
            )
            from inverserenderingofindoorscene_tpu.pipeline.bilateral import (
                normalized_guide,
            )
            from inverserenderingofindoorscene_tpu.pipeline.brdf import (
                brdf_forward,
            )

            @jax.jit
            def _counts(b):
                preds = brdf_forward(brdf_nets, bp, b)
                g = normalized_guide(preds["albedo"])
                return jnp.stack(
                    [jnp.max(count_vertices(g, MODE_PARAMS[m]))
                     for m in (0, 2, 4)]
                )

            nvert = int(np.asarray(_counts(batch)).max())
            cap = bucket_capacity(nvert, 240 * 320)
            ecap = edge_bucket(2 * nvert, cap)
            while True:  # probe until the bucket is TIGHT for this batch
                step = jax.jit(make_bilateral_train_step(
                    brdf_nets, BilateralNets(v_max=cap, e_max=ecap), bp))
                _, metrics = step(state, batch)
                nedges = int(metrics["nedges_max"])
                tight = edge_bucket(nedges, cap)
                if tight == ecap:
                    break
                ecap = tight
            log(f"auto caps: nvert={nvert} -> v_max={cap} (of {240 * 320}), "
                f"nedges={nedges} -> e_max={ecap} (of {8 * cap})")
            return step, state, batch
        if v_max != "full":
            bs_nets = BilateralNets(v_max=int(v_max))
        step = jax.jit(
            make_bilateral_train_step(brdf_nets, bs_nets, bp),
            donate_argnums=(0,),
        )
        return step, state, batch
    brdf_nets = BRDFNets(cascade_level=cascade, compute_dtype=dtype)
    light_nets = LightNets(cascade_level=cascade, compute_dtype=dtype)
    bp = brdf_nets.init(jax.random.PRNGKey(0), (240, 320))
    lp = light_nets.init(jax.random.PRNGKey(1))
    batch = synthetic_batch(
        batch=5 if batch_size is None else batch_size,
        im_hw=(240, 320), env_rc=(120, 160), cascade_level=cascade)
    step = jax.jit(
        make_light_train_step(brdf_nets, light_nets, bp, use_pallas=True),
        donate_argnums=(0,),
    )
    state = create_train_state(lp, reference_adam(1e-4))
    return step, state, batch


def cost_flops(step, state, batch):
    try:
        c = step.lower(state, batch).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception as e:  # pragma: no cover
        log(f"cost_analysis unavailable: {e}")
        return 0.0


CATEGORIES = (
    ("conv", ("conv", "cudnn")),
    ("matmul", ("dot", "einsum")),
    # The Pallas tpu_custom_call ops inherit their HLO op names from the
    # custom_vjp trace scopes: the fwd kernels surface as "jvp__.N" and the
    # bwd kernels as "transpose_jvp___.N" (verified against the compiled
    # light-step HLO: every custom_call_target="tpu_custom_call" op carries
    # one of those names).  Match them BEFORE the copy/transpose bucket or
    # the backward kernels land there and pallas reads 0.00 ms.
    ("pallas", ("sg_", "custom-call", "tpu_custom_call")),
    ("resize/pool", ("resize", "reduce-window", "gather", "pad", "slice")),
    ("norm/elemwise", ("fusion",)),
    ("copy/transpose", ("copy", "transpose", "bitcast", "reshape")),
    ("allreduce", ("all-reduce", "psum")),
)

# Pallas custom_vjp scope prefixes must be ANCHORED (startswith), not
# substring-matched: any HLO op whose sanitized name merely inherits the
# same custom_vjp scope somewhere inside would otherwise be misbucketed
# into pallas and inflate it.
_PALLAS_PREFIXES = ("jvp__", "transpose_jvp___")


def categorize(name):
    lname = name.lower()
    if lname.startswith(_PALLAS_PREFIXES):
        return "pallas"
    for cat, keys in CATEGORIES:
        if any(k in lname for k in keys):
            return cat
    return "other"


def attribute_trace(logdir):
    """Aggregate device-op durations from the newest trace.json.gz."""
    files = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        log("no trace files found")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes only: pid names containing "TPU"/"Device"
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(e["pid"])
    buckets = defaultdict(float)
    tops = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        # drop umbrella/module events (whole-program spans, run ids)
        if name.isdigit() or name.startswith("jit_") or name == "?":
            continue
        dur = e.get("dur", 0) / 1e3  # ms
        buckets[categorize(name)] += dur
        tops[name] += dur
    total = sum(buckets.values())
    log(f"-- device time by category (total {total:.1f} ms traced) --")
    for cat, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
        log(f"  {cat:<16} {ms:8.2f} ms  {100*ms/max(total,1e-9):5.1f}%")
    log("-- top ops --")
    for name, ms in sorted(tops.items(), key=lambda kv: -kv[1])[:25]:
        log(f"  {ms:8.2f} ms  {name[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="both")
    ap.add_argument("--cascade", type=int, default=0)
    ap.add_argument("--dtype", default="both")
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--logdir", default="/tmp/step_trace")
    ap.add_argument("--vMax", default="full",
                    help="bilateral stage only: 'full', 'auto', or int")
    ap.add_argument("--photoLike", action="store_true",
                    help="bilateral stage: piecewise-smooth input instead "
                         "of per-pixel noise (the grid's worst case)")
    def _positive_int(s):
        v = int(s)
        if v < 1:
            raise argparse.ArgumentTypeError("--batch must be >= 1")
        return v

    ap.add_argument("--batch", type=_positive_int, default=None,
                    help="override the stage's reference batch size "
                         "(brdf 16, light 5, bilateral 2)")
    opt = ap.parse_args()

    stages = ["brdf", "light"] if opt.stage == "both" else [opt.stage]
    dtypes = (
        ["float32", "bfloat16"] if opt.dtype == "both" else [opt.dtype]
    )
    for stage in stages:
        for dtype in dtypes:
            step, state, batch = build_step(stage, dtype, opt.cascade,
                                            opt.vMax, opt.photoLike,
                                            opt.batch)
            flops = cost_flops(step, state, batch)
            # donated state: rebuild per timing call chain
            state2, _ = step(state, batch)
            fence(state2)
            t0 = time.perf_counter()
            iters = 10
            cur = state2
            for _ in range(iters):
                cur, metrics = step(cur, batch)
            fence(metrics)
            ms = (time.perf_counter() - t0) / iters * 1e3
            frac = flops / (ms / 1e3) / MXU_PEAK[dtype] if flops else 0.0
            bsz = batch["im"].shape[0]
            log(f"{stage:<6} {dtype:<9} {ms:7.1f} ms/step   "
                f"XLA flops {flops/1e9:6.1f} G   MXU frac {frac*100:5.1f}%   "
                f"B{bsz}: {bsz / (ms / 1e3):6.1f} img/s")
            if opt.trace:
                from inverserenderingofindoorscene_tpu.utils.profiling import (
                    trace,
                )

                with trace(opt.logdir):
                    cur, metrics = step(cur, batch)
                    fence(metrics)
                attribute_trace(opt.logdir)


if __name__ == "__main__":
    main()
