"""Lighting training driver (the trainLight.py equivalent).

Loads the frozen cascade-k BRDF checkpoint, trains lightEncoder + 3 SG
decoders with loss ``10*reconst + 1*render`` through the fused Pallas
shading kernel (/root/reference/trainLight.py:99-244).

Usage: python -m inverserenderingofindoorscene_tpu.cli.train_light \
    --dataRoot ... --brdfExperiment check_cascade0_w320_h240 --brdfEpoch 13
"""

from __future__ import annotations

import jax

from inverserenderingofindoorscene_tpu.cli import common
from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
from inverserenderingofindoorscene_tpu.pipeline.light import LightNets
from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    make_light_train_step,
    reference_adam,
)
from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt
from inverserenderingofindoorscene_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--reconstWeight", type=float, default=10.0)
    p.add_argument("--renderWeight", type=float, default=1.0)
    p.add_argument("--offset", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=1e-4,
                   help="reference: trainLight.py:28 (1e-4); scale with "
                        "batch when running above the B5 operating point")
    p.add_argument("--brdfExperiment", required=False, default=None)
    p.add_argument("--brdfEpoch", type=int, default=None)
    p.add_argument("--resumeEpoch", type=int, default=None)
    p.add_argument("--computeDtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="conv-stack compute dtype (params stay f32)")
    p.add_argument("--usePallas", action="store_true", default=True)
    p.add_argument("--noPallas", dest="usePallas", action="store_false")
    p.set_defaults(batchSize=5)
    return p.parse_args(argv)


def load_frozen_brdf(opt, rng):
    nets = BRDFNets(cascade_level=opt.cascadeLevel)
    params = nets.init(rng, (opt.imHeight, opt.imWidth))
    exp = opt.brdfExperiment or common.default_experiment_name(opt, "brdf")
    epoch = opt.brdfEpoch
    if epoch is None:
        epoch = ckpt.latest_epoch(exp, "brdf", opt.cascadeLevel)
    if epoch is not None:
        # checkpoints store the full TrainState pytree; only params needed
        from inverserenderingofindoorscene_tpu.train.steps import (
            create_train_state,
            reference_adam,
        )

        state = create_train_state(params, reference_adam(1e-4))
        state = ckpt.restore_checkpoint(exp, "brdf", opt.cascadeLevel, epoch,
                                        state)
        params = state.params
        print(f"loaded frozen BRDF from {exp} epoch {epoch}")
    else:
        print("WARNING: no BRDF checkpoint found; using random frozen nets")
    return nets, params


def main(argv=None):
    opt = parse_args(argv)
    exp = common.experiment_dir(opt, "light")
    rng = common.pin_seeds(opt.seed)
    k1, k2 = jax.random.split(rng)

    brdf_nets, brdf_params = load_frozen_brdf(opt, k1)
    light_nets = LightNets(
        sg_num=opt.SGNum,
        cascade_level=opt.cascadeLevel,
        env_rows=opt.envRow,
        env_cols=opt.envCol,
        env_height=opt.envHeight,
        env_width=opt.envWidth,
        compute_dtype=opt.computeDtype,
    )
    light_params = light_nets.init(k2)

    loader = common.make_loader(opt, "TRAIN", is_light=True)
    tx = reference_adam(opt.lr, epoch_decay_steps=10 * max(len(loader), 1))
    state = create_train_state(light_params, tx)

    state, start_epoch, skip = common.resume_train_state(
        opt, exp, "light", opt.cascadeLevel, state,
        explicit_epoch=opt.resumeEpoch,
    )

    step_fn = jax.jit(
        make_light_train_step(
            brdf_nets, light_nets, brdf_params,
            reconst_w=opt.reconstWeight, render_w=opt.renderWeight,
            offset=opt.offset, use_pallas=opt.usePallas,
        ),
        donate_argnums=(0,),
    )

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
                opt, exp, "light", opt.cascadeLevel, state, epoch, j,
                logger=logger,
            )
        if epoch % opt.saveEvery == 0 or epoch == opt.nepoch - 1:
            ckpt.save_checkpoint(exp, "light", opt.cascadeLevel, epoch, state)
            logger.save_curves(exp, epoch)
    logger.close()


if __name__ == "__main__":
    main()
