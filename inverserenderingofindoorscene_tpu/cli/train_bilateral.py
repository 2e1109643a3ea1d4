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
    p.set_defaults(batchSize=2, nepoch=1)
    return p.parse_args(argv)


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

    start_epoch = 0
    resume = opt.resumeEpoch
    if resume is None:
        resume = ckpt.latest_epoch(exp, "bs", opt.cascadeLevel)
    if resume is not None:
        state = ckpt.restore_checkpoint(exp, "bs", opt.cascadeLevel, resume,
                                        state)
        start_epoch = resume + 1

    step_fn = jax.jit(
        make_bilateral_train_step(
            brdf_nets, bs_nets, brdf_params,
            albedo_w=opt.albedoWeight, rough_w=opt.roughWeight,
            depth_w=opt.depthWeight,
        ),
        donate_argnums=(0,),
    )

    logger = MetricLogger(f"{exp}/trainingLog.txt")
    for epoch in range(start_epoch, opt.nepoch):
        for j, np_batch in enumerate(loader):
            if opt.maxSteps is not None and j >= opt.maxSteps:
                break
            batch = common.stage_batch(np_batch)
            state, metrics = step_fn(state, batch)
            logger.log(epoch, j, {k: float(v) for k, v in metrics.items()})
        ckpt.save_checkpoint(exp, "bs", opt.cascadeLevel, epoch, state)
        logger.save_curves(exp, epoch)
    logger.close()


if __name__ == "__main__":
    main()
