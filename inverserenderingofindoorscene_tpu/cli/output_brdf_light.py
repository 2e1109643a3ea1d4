"""Cascade hand-off exporter (the outputBRDFLight.py equivalent).

Runs the frozen cascade-k BRDF+Light stack over the TRAIN or TEST split and
writes the 7 intermediate `.h5` products beside the dataset images,
skipping existing files (/root/reference/outputBRDFLight.py:195-301).
"""

from __future__ import annotations

import jax

from inverserenderingofindoorscene_tpu.cli import common
from inverserenderingofindoorscene_tpu.cli.train_light import load_frozen_brdf
from inverserenderingofindoorscene_tpu.pipeline.export import (
    export_step,
    write_products,
)
from inverserenderingofindoorscene_tpu.pipeline.light import LightNets
from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    reference_adam,
)
from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt
from inverserenderingofindoorscene_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--mode", default="TRAIN", choices=["TRAIN", "TEST"])
    p.add_argument("--offset", type=float, default=1.0)
    p.add_argument("--brdfExperiment", default=None)
    p.add_argument("--brdfEpoch", type=int, default=None)
    p.add_argument("--lightExperiment", default=None)
    p.add_argument("--lightEpoch", type=int, default=None)
    p.set_defaults(batchSize=4)
    return p.parse_args(argv)


def load_frozen_light(opt, rng, light_nets):
    params = light_nets.init(rng)
    naming_offset = getattr(opt, "trainOffset", None)
    if naming_offset is None:
        naming_offset = getattr(opt, "offset", 1.0)
    exp = opt.lightExperiment or common.default_experiment_name(
        opt, "light", offset=naming_offset
    )
    epoch = opt.lightEpoch
    if epoch is None:
        epoch = ckpt.latest_epoch(exp, "light", opt.cascadeLevel)
    if epoch is not None:
        state = create_train_state(params, reference_adam(1e-4))
        state = ckpt.restore_checkpoint(exp, "light", opt.cascadeLevel,
                                        epoch, state)
        params = state.params
        print(f"loaded frozen Light from {exp} epoch {epoch}")
    else:
        print("WARNING: no Light checkpoint found; using random frozen nets")
    return params


def main(argv=None):
    opt = parse_args(argv)
    rng = common.pin_seeds(opt.seed)
    k1, k2 = jax.random.split(rng)

    brdf_nets, brdf_params = load_frozen_brdf(opt, k1)
    light_nets = LightNets(
        sg_num=opt.SGNum, cascade_level=opt.cascadeLevel,
        env_rows=opt.envRow, env_cols=opt.envCol,
        env_height=opt.envHeight, env_width=opt.envWidth,
    )
    light_params = load_frozen_light(opt, k2, light_nets)

    loader = common.make_loader(opt, opt.mode, is_light=True, shuffle=False)
    # params as jit args (closed-over trees embed as HLO constants and
    # bloat/overflow the remote compile request at full resolution)
    import functools

    fwd = functools.partial(
        jax.jit(
            lambda ps, b: export_step(
                brdf_nets, light_nets, ps[0], ps[1], b,
                offset=opt.offset,
            )
        ),
        jax.device_put((brdf_params, light_params)),
    )

    logger = MetricLogger()
    for j, np_batch in enumerate(loader):
        if opt.maxSteps is not None and j >= opt.maxSteps:
            break
        batch = common.stage_batch(np_batch)
        products, losses = fwd(batch)
        logger.log(0, j, {k: float(v) for k, v in losses.items()})
        written = write_products(
            products, np_batch["name"], opt.cascadeLevel,
            env_ind=np_batch.get("env_ind"),
        )
        print(f"batch {j}: wrote {len(written)} files")


if __name__ == "__main__":
    main()
