"""Bilateral refinement training driver (the trainBRDFBilateral.py equivalent).

Frozen BRDF nets; trains the three confidence CNNs through the on-device
bilateral solver; loss ``4*1.5*albedoBs + 0.5*roughBs + 0.5*depthBs``
(/root/reference/trainBRDFBilateral.py:98-149, 345-352).
"""

from __future__ import annotations

import jax

from inverserenderingofindoorscene_tpu.cli import common
from inverserenderingofindoorscene_tpu.cli.train_light import load_frozen_brdf
from inverserenderingofindoorscene_tpu.pipeline.bilateral import BilateralNets
from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    make_bilateral_train_step,
    reference_adam,
)
from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt
from inverserenderingofindoorscene_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--albedoWeight", type=float, default=1.5)
    p.add_argument("--roughWeight", type=float, default=0.5)
    p.add_argument("--depthWeight", type=float, default=0.5)
    p.add_argument("--brdfExperiment", default=None)
    p.add_argument("--brdfEpoch", type=int, default=None)
    p.add_argument("--resumeEpoch", type=int, default=None)
    p.add_argument("--vMax", default="full",
                   help="solver vertex capacity: 'full' (one per pixel), "
                        "'auto' (count the guide's occupied cells per "
                        "batch, dispatch to a ladder-bucketed compile of "
                        "the step — exact, far fewer gather rows, but up "
                        "to one recompile per bucket), or an int")
    p.set_defaults(batchSize=2, nepoch=1)
    return p.parse_args(argv)


def _auto_vmax_dispatch(opt, brdf_nets, brdf_params, jit_step):
    """Per-batch exact capacity selection for the train step.

    The guide (detached max-normalized albedo prediction) depends only on
    the frozen BRDF nets, so one small extra jitted forward counts the
    occupied grid cells for the three modes and the batch dispatches to a
    step compiled at the smallest ladder capacity that holds them — exact
    (no cells merge) with a bounded number of step compiles.

    Capacities (vertex AND edge buckets) are validated AFTER the fact:
    the step returns the true nvert/nedges maxima as metrics, and a
    batch whose counts overflowed the current buckets is re-run at the
    bumped capacity (results of the overflowed run are discarded), so
    every accepted step is exact.  Only the FIRST batch pays an extra
    counting forward to seed the vertex bucket; steady state pays zero
    extra cost and the retry path costs at most one recompile per
    bucket bump."""
    import jax.numpy as jnp
    import numpy as np

    from inverserenderingofindoorscene_tpu.ops.bilateral import (
        MODE_PARAMS,
        bucket_capacity,
        count_vertices,
        edge_bucket,
    )
    from inverserenderingofindoorscene_tpu.pipeline.bilateral import (
        normalized_guide,
    )
    from inverserenderingofindoorscene_tpu.pipeline.brdf import brdf_forward

    mode_params = tuple(MODE_PARAMS[m] for m in (0, 2, 4))
    n_pixels = opt.imHeight * opt.imWidth

    @jax.jit
    def jit_counts(batch):
        preds = brdf_forward(brdf_nets, brdf_params, batch)
        guide = normalized_guide(preds["albedo"])
        return jnp.stack(
            [jnp.max(count_vertices(guide, p)) for p in mode_params]
        )

    steps = {}
    caps = {}  # "v": vertex bucket; "guess_e": first-run edge guess;
    # "seen_e": {v_cap: running max of TRUE observed edge counts}

    def step_fn(state, batch):
        if "v" not in caps:  # first batch only: seed the vertex bucket
            nvert0 = int(np.asarray(jit_counts(batch)).max())
            caps["v"] = bucket_capacity(nvert0, n_pixels)
            caps["guess_e"] = edge_bucket(2 * nvert0, caps["v"])
            caps["seen_e"] = {}
        while True:
            vcap = caps["v"]
            seen = caps["seen_e"].get(vcap)
            ecap = (edge_bucket(seen, vcap) if seen is not None
                    else caps["guess_e"])
            key = (vcap, ecap)
            if key not in steps:
                steps[key] = jit_step(
                    BilateralNets(v_max=vcap, e_max=ecap), donate=False
                )
            new_state, metrics = steps[key](state, batch)
            # nedges_max is the TRUE link count (never clipped);
            # nvert_max IS clipped by the capacity (overfull cells merge
            # silently, ops/bilateral.py build_grid), so at-capacity
            # means "possibly clipped" and must bump unless the bucket
            # is already one-vertex-per-pixel.
            nvert = int(metrics["nvert_max"])
            nedges = int(metrics["nedges_max"])
            caps["seen_e"][vcap] = max(seen or 0, nedges)
            v_clipped = nvert >= vcap and vcap < n_pixels
            if not v_clipped and nedges <= ecap:
                return new_state, metrics
            # overflow: discard the (inexact) run, bump, re-run
            if v_clipped:
                caps["v"] = bucket_capacity(vcap + 1, n_pixels)
                # reseed the bigger bucket's edge guess from what was
                # just observed (a larger grid has at least as many
                # links), not the first batch's stale guess — avoids a
                # guaranteed wasted execution at the new v_cap
                caps["guess_e"] = edge_bucket(2 * nedges, caps["v"])

    return step_fn


def main(argv=None):
    opt = parse_args(argv)
    exp = common.experiment_dir(opt, "bs")
    rng = common.pin_seeds(opt.seed)
    k1, k2 = jax.random.split(rng)

    brdf_nets, brdf_params = load_frozen_brdf(opt, k1)
    bs_nets = BilateralNets()
    bs_params = bs_nets.init(k2, (opt.imHeight, opt.imWidth))

    loader = common.make_loader(opt, "TRAIN", is_light=False)
    state = create_train_state(bs_params, reference_adam(1e-4))

    state, start_epoch, skip = common.resume_train_state(
        opt, exp, "bs", opt.cascadeLevel, state,
        explicit_epoch=opt.resumeEpoch,
    )

    def jit_step(nets, donate=True):
        # No donation under auto dispatch: an edge-bucket overflow re-runs
        # the batch with the SAME state, which donation would invalidate.
        return jax.jit(
            make_bilateral_train_step(
                brdf_nets, nets, brdf_params,
                albedo_w=opt.albedoWeight, rough_w=opt.roughWeight,
                depth_w=opt.depthWeight,
            ),
            donate_argnums=(0,) if donate else (),
        )

    if opt.vMax == "auto":
        step_fn = _auto_vmax_dispatch(opt, brdf_nets, brdf_params, jit_step)
    else:
        if opt.vMax != "full":
            bs_nets = BilateralNets(v_max=int(opt.vMax))
        step_fn = jit_step(bs_nets)

    logger = MetricLogger(f"{exp}/trainingLog.txt",
                          flush_steps=opt.logFlushSteps)
    for epoch in range(start_epoch, opt.nepoch):
        for j, np_batch in enumerate(loader):
            if opt.maxSteps is not None and j >= opt.maxSteps:
                break
            if epoch == start_epoch and j < skip:
                continue  # mid-epoch resume: replay position, not steps
            batch = common.stage_batch(np_batch)
            state, metrics = step_fn(state, batch)
            logger.log_device(epoch, j, metrics)
            common.maybe_save_step_checkpoint(
                opt, exp, "bs", opt.cascadeLevel, state, epoch, j,
                logger=logger,
            )
        ckpt.save_checkpoint(exp, "bs", opt.cascadeLevel, epoch, state)
        logger.save_curves(exp, epoch)
    logger.close()


if __name__ == "__main__":
    main()
