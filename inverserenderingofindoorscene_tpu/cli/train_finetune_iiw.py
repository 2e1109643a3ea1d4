"""IIW fine-tune driver (the trainFineTuneIIW.py equivalent).

Alternates one synthetic batch (full BRDF losses) and one IIW batch
(ranking losses, weight rankW=2) per optimizer cycle
(/root/reference/trainFineTuneIIW.py:147-263), optimizing the whole BRDF
stack at the reference's lr 1e-4.
"""

from __future__ import annotations

import jax

from inverserenderingofindoorscene_tpu.cli import common
from inverserenderingofindoorscene_tpu.cli.train_light import load_frozen_brdf
from inverserenderingofindoorscene_tpu.data.iiw import IIWDataset
from inverserenderingofindoorscene_tpu.data.openrooms import BatchIterator
from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    make_brdf_train_step,
    make_iiw_train_step,
    reference_adam,
)
from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt
from inverserenderingofindoorscene_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--iiwRoot", help="path to the IIW data")
    p.add_argument("--iiwList", default="IIWTrain.txt")
    p.add_argument("--rankWeight", type=float, default=2.0)
    p.add_argument("--albedoWeight", type=float, default=1.5)
    p.add_argument("--normalWeight", type=float, default=1.0)
    p.add_argument("--roughWeight", type=float, default=0.5)
    p.add_argument("--depthWeight", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=1e-4,
                   help="reference: trainFineTuneIIW.py:94,115 (lr_scale=1)")
    p.add_argument("--brdfExperiment", default=None)
    p.add_argument("--brdfEpoch", type=int, default=None)
    p.add_argument("--brdf0Experiment", default=None,
                   help="cascade-0 BRDF experiment for the inline Pre "
                        "synthesis at --cascadeLevel 1 (--brdfExperiment "
                        "then names the cascade-1 init point)")
    p.add_argument("--brdf0Epoch", type=int, default=None)
    p.add_argument("--light0Experiment", default=None,
                   help="cascade-0 Light experiment for the inline Pre "
                        "synthesis at --cascadeLevel 1")
    p.add_argument("--light0Epoch", type=int, default=None)
    p.set_defaults(nepoch=3)
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)
    opt.experiment = opt.experiment or (
        "checkIIW_cascade%d_w%d_h%d" % (opt.cascadeLevel, opt.imWidth,
                                        opt.imHeight)
    )
    exp = common.experiment_dir(opt, "iiw")
    rng = common.pin_seeds(opt.seed)

    nets, params = load_frozen_brdf(opt, rng)  # init point, NOT frozen here
    syn_loader = common.make_loader(opt, "TRAIN", is_light=False)
    iiw_ds = IIWDataset(opt.iiwRoot, opt.iiwList,
                        im_hw=(opt.imHeight, opt.imWidth), seed=opt.seed)
    iiw_loader = BatchIterator(iiw_ds, opt.batchSize, seed=opt.seed,
                               num_workers=opt.numWorkers)

    state = create_train_state(params, reference_adam(opt.lr))
    syn_step = jax.jit(
        make_brdf_train_step(nets, opt.albedoWeight, opt.normalWeight,
                             opt.roughWeight, opt.depthWeight),
        donate_argnums=(0,),
    )
    iiw_step_fn = jax.jit(
        make_iiw_train_step(nets, rank_w=opt.rankWeight), donate_argnums=(0,)
    )

    # At cascade 1 the real-data batches need the *_pre inputs synthesized
    # by the frozen cascade-0 stack (trainFineTuneIIW_cascade1.py:300-362).
    synth = None
    if opt.cascadeLevel > 0:
        synth = common.make_pre_synth(opt, jax.random.PRNGKey(opt.seed + 7))

    state, start_epoch, skip = common.resume_train_state(
        opt, exp, "iiw", opt.cascadeLevel, state
    )

    logger = MetricLogger(f"{exp}/trainingLog.txt",
                          flush_steps=opt.logFlushSteps)
    for epoch in range(start_epoch, opt.nepoch):
        pairs, _ = common.zip_max_cycle(syn_loader, iiw_loader)
        for j, (syn_np, iiw_np) in enumerate(pairs):
            if opt.maxSteps is not None and j >= opt.maxSteps:
                break
            if epoch == start_epoch and j < skip:
                continue  # mid-epoch resume: replay position, not steps
            state, m1 = syn_step(state, common.stage_batch(syn_np))
            iiw_batch = common.stage_batch(iiw_np)
            if synth is not None:
                iiw_batch = synth(iiw_batch)
            state, m2 = iiw_step_fn(state, iiw_batch)
            logger.log_device(
                epoch, j,
                {**{f"syn_{k}": v for k, v in m1.items()},
                 **{f"iiw_{k}": v for k, v in m2.items()}},
            )
            common.maybe_save_step_checkpoint(
                opt, exp, "iiw", opt.cascadeLevel, state, epoch, j,
                logger=logger,
            )
        ckpt.save_checkpoint(exp, "iiw", opt.cascadeLevel, epoch, state)
        logger.save_curves(exp, epoch)
    logger.close()


if __name__ == "__main__":
    main()
