"""NYU fine-tune driver (the trainFineTuneNYU.py equivalent).

Alternates one synthetic batch (full BRDF losses) and one NYU batch
(normal/depth losses, weights 4.5/4.5)
(/root/reference/trainFineTuneNYU.py:170-264).
"""

from __future__ import annotations

import jax

from inverserenderingofindoorscene_tpu.cli import common
from inverserenderingofindoorscene_tpu.cli.train_light import load_frozen_brdf
from inverserenderingofindoorscene_tpu.data.nyu import NYUDataset
from inverserenderingofindoorscene_tpu.data.openrooms import BatchIterator
from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    make_brdf_train_step,
    make_nyu_train_step,
    reference_adam,
)
from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt
from inverserenderingofindoorscene_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--nyuImRoot")
    p.add_argument("--nyuNormalRoot")
    p.add_argument("--nyuDepthRoot")
    p.add_argument("--nyuSegRoot")
    p.add_argument("--nyuList", default="NYUTrain.txt")
    p.add_argument("--normalNYUWeight", type=float, default=4.5)
    p.add_argument("--depthNYUWeight", type=float, default=4.5)
    p.add_argument("--albedoWeight", type=float, default=1.5)
    p.add_argument("--normalWeight", type=float, default=1.0)
    p.add_argument("--roughWeight", type=float, default=0.5)
    p.add_argument("--depthWeight", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=5e-5,
                   help="reference: trainFineTuneNYU.py:100,122 (1e-4 * lr_scale=0.5)")
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
        "checkNYU_cascade%d_w%d_h%d" % (opt.cascadeLevel, opt.imWidth,
                                        opt.imHeight)
    )
    exp = common.experiment_dir(opt, "nyu")
    rng = common.pin_seeds(opt.seed)

    nets, params = load_frozen_brdf(opt, rng)
    syn_loader = common.make_loader(opt, "TRAIN", is_light=False)
    nyu_ds = NYUDataset(
        opt.nyuImRoot, opt.nyuNormalRoot, opt.nyuDepthRoot, opt.nyuSegRoot,
        opt.nyuList, im_hw=(opt.imHeight, opt.imWidth), seed=opt.seed,
    )
    nyu_loader = BatchIterator(nyu_ds, opt.batchSize, seed=opt.seed,
                               num_workers=opt.numWorkers)

    state = create_train_state(params, reference_adam(opt.lr))
    syn_step = jax.jit(
        make_brdf_train_step(nets, opt.albedoWeight, opt.normalWeight,
                             opt.roughWeight, opt.depthWeight),
        donate_argnums=(0,),
    )
    nyu_step_fn = jax.jit(
        make_nyu_train_step(nets, opt.normalNYUWeight, opt.depthNYUWeight),
        donate_argnums=(0,),
    )

    # At cascade 1 the real-data batches need the *_pre inputs synthesized
    # by the frozen cascade-0 stack (trainFineTuneNYU_cascade1.py:311-374).
    synth = None
    if opt.cascadeLevel > 0:
        synth = common.make_pre_synth(opt, jax.random.PRNGKey(opt.seed + 7))

    state, start_epoch, skip = common.resume_train_state(
        opt, exp, "nyu", opt.cascadeLevel, state
    )

    logger = MetricLogger(f"{exp}/trainingLog.txt",
                          flush_steps=opt.logFlushSteps)
    for epoch in range(start_epoch, opt.nepoch):
        pairs, _ = common.zip_max_cycle(syn_loader, nyu_loader)
        for j, (syn_np, nyu_np) in enumerate(pairs):
            if opt.maxSteps is not None and j >= opt.maxSteps:
                break
            if epoch == start_epoch and j < skip:
                continue  # mid-epoch resume: replay position, not steps
            state, m1 = syn_step(state, common.stage_batch(syn_np))
            nyu_batch = common.stage_batch(nyu_np)
            if synth is not None:
                nyu_batch = synth(nyu_batch)
            state, m2 = nyu_step_fn(state, nyu_batch)
            logger.log_device(
                epoch, j,
                {**{f"syn_{k}": v for k, v in m1.items()},
                 **{f"nyu_{k}": v for k, v in m2.items()}},
            )
            common.maybe_save_step_checkpoint(
                opt, exp, "nyu", opt.cascadeLevel, state, epoch, j,
                logger=logger,
            )
        ckpt.save_checkpoint(exp, "nyu", opt.cascadeLevel, epoch, state)
        logger.save_curves(exp, epoch)
    logger.close()


if __name__ == "__main__":
    main()
