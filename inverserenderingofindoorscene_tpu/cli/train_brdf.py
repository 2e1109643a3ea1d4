"""Cascade BRDF training driver (the trainBRDF.py equivalent).

One jitted ``train_step`` per batch; Adam(1e-4, betas=(0.5, 0.999)) over
encoder+4 decoders with LR halved every 10 epochs; orbax checkpoints per
epoch under the reference's ``check_cascade{k}_w{W}_h{H}`` naming; loss
``4*1.5*albedo + 1.0*normal + 0.5*rough + 0.5*depth``
(/root/reference/trainBRDF.py).

Usage: python -m inverserenderingofindoorscene_tpu.cli.train_brdf --dataRoot ...
"""

from __future__ import annotations

import jax

from inverserenderingofindoorscene_tpu.cli import common
from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    make_brdf_train_step,
    reference_adam,
)
from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt
from inverserenderingofindoorscene_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--albedoWeight", type=float, default=1.5)
    p.add_argument("--normalWeight", type=float, default=1.0)
    p.add_argument("--roughWeight", type=float, default=0.5)
    p.add_argument("--depthWeight", type=float, default=0.5)
    p.add_argument("--resumeEpoch", type=int, default=None)
    p.add_argument("--previewEvery", type=int, default=2000,
                   help="dump GT/pred PNGs every N steps (trainBRDF.py:334)")
    p.add_argument("--computeDtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="conv-stack compute dtype (params stay f32)")
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)
    exp = common.experiment_dir(opt, "brdf")
    rng = common.pin_seeds(opt.seed)

    nets = BRDFNets(cascade_level=opt.cascadeLevel,
                    compute_dtype=opt.computeDtype)
    params = nets.init(rng, (opt.imHeight, opt.imWidth))

    loader = common.make_loader(opt, "TRAIN", is_light=False)
    steps_per_10_epochs = 10 * max(len(loader), 1)
    tx = reference_adam(1e-4, epoch_decay_steps=steps_per_10_epochs)
    state = create_train_state(params, tx)

    state, start_epoch, skip = common.resume_train_state(
        opt, exp, "brdf", opt.cascadeLevel, state,
        explicit_epoch=opt.resumeEpoch,
    )

    step_fn = jax.jit(
        make_brdf_train_step(
            nets, opt.albedoWeight, opt.normalWeight, opt.roughWeight,
            opt.depthWeight,
        ),
        donate_argnums=(0,),
    )

    from inverserenderingofindoorscene_tpu.pipeline.brdf import brdf_forward

    # hoisted: one compiled preview forward, reused every dump
    preview_fn = jax.jit(lambda p, b: brdf_forward(nets, p, b))

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
                opt, exp, "brdf", opt.cascadeLevel, state, epoch, j,
                logger=logger,
            )
            if opt.previewEvery and j % opt.previewEvery == 0:
                preds = preview_fn(state.params, batch)
                common.dump_preview(exp, epoch, j, {
                    "im": (batch["im"], True),
                    "albedoGt": (batch["albedo"], True),
                    "albedoPred": (preds["albedo"], True),
                    "normalPred": (0.5 * (preds["normal"] + 1.0), False),
                    "roughPred": (0.5 * (preds["rough"] + 1.0), False),
                    "depthPred": (
                        1.0 / jax.numpy.clip(preds["depth"], 0.1, None) * 0.3,
                        False,
                    ),
                })
        if epoch % opt.saveEvery == 0 or epoch == opt.nepoch - 1:
            ckpt.save_checkpoint(exp, "brdf", opt.cascadeLevel, epoch, state)
            logger.save_curves(exp, epoch)
    logger.close()


if __name__ == "__main__":
    main()
