"""Held-out-split evaluation driver (testBRDF / testLight / testBRDFBilateral).

Computes the masked error metrics over the TEST split and accumulates
means, like the reference test drivers (/root/reference/testBRDF.py,
testLight.py — note the envmap log offset is 1e-3 at eval, testLight.py:222 —
and testBRDFBilateral.py's raw-vs-refined two-column errors).

Usage: python -m inverserenderingofindoorscene_tpu.cli.test_synthetic \
    --stage light --dataRoot ...
"""

from __future__ import annotations

import numpy as np

import jax

from inverserenderingofindoorscene_tpu.cli import common
from inverserenderingofindoorscene_tpu.cli.output_brdf_light import (
    load_frozen_light,
)
from inverserenderingofindoorscene_tpu.cli.train_light import load_frozen_brdf
from inverserenderingofindoorscene_tpu.pipeline.bilateral import (
    BilateralNets,
    bilateral_step,
)
from inverserenderingofindoorscene_tpu.pipeline.brdf import brdf_step
from inverserenderingofindoorscene_tpu.pipeline.light import LightNets, light_step
from inverserenderingofindoorscene_tpu.train.steps import (
    create_train_state,
    reference_adam,
)
from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt


def parse_args(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--stage", default="brdf",
                   choices=["brdf", "light", "bilateral"])
    p.add_argument("--offset", type=float, default=1e-3,
                   help="envmap log offset at eval (testLight.py:222)")
    p.add_argument("--trainOffset", type=float, default=1.0,
                   help="offset the light stage was TRAINED with — used "
                        "only for the checkpoint experiment-dir name")
    p.add_argument("--brdfExperiment", default=None)
    p.add_argument("--brdfEpoch", type=int, default=None)
    p.add_argument("--lightExperiment", default=None)
    p.add_argument("--lightEpoch", type=int, default=None)
    p.add_argument("--bsExperiment", default=None)
    p.add_argument("--bsEpoch", type=int, default=None)
    p.set_defaults(batchSize=4)
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)
    rng = common.pin_seeds(opt.seed)
    k1, k2 = jax.random.split(rng)
    brdf_nets, brdf_params = load_frozen_brdf(opt, k1)

    if opt.stage == "brdf":
        fwd = jax.jit(lambda b: brdf_step(brdf_nets, brdf_params, b)[1])
        loader = common.make_loader(opt, "TEST", is_light=False,
                                    shuffle=False)
    elif opt.stage == "light":
        light_nets = LightNets(
            sg_num=opt.SGNum, cascade_level=opt.cascadeLevel,
            env_rows=opt.envRow, env_cols=opt.envCol,
            env_height=opt.envHeight, env_width=opt.envWidth,
        )
        light_params = load_frozen_light(opt, k2, light_nets)
        fwd = jax.jit(
            lambda b: light_step(
                brdf_nets, light_nets, brdf_params, light_params, b,
                offset=opt.offset,
            )[0]
        )
        loader = common.make_loader(opt, "TEST", is_light=True, shuffle=False)
    else:
        bs_nets = BilateralNets()
        bs_params = bs_nets.init(k2, (opt.imHeight, opt.imWidth))
        exp = opt.bsExperiment or "checkBs_cascade%d_w%d_h%d" % (
            opt.cascadeLevel, opt.imWidth, opt.imHeight
        )
        epoch = opt.bsEpoch
        if epoch is None:
            epoch = ckpt.latest_epoch(exp, "bs", opt.cascadeLevel)
        if epoch is not None:
            state = create_train_state(bs_params, reference_adam(1e-4))
            state = ckpt.restore_checkpoint(exp, "bs", opt.cascadeLevel,
                                            epoch, state)
            bs_params = state.params
        fwd = jax.jit(
            lambda b: bilateral_step(
                brdf_nets, bs_nets, brdf_params, bs_params, b
            )[0]
        )
        loader = common.make_loader(opt, "TEST", is_light=False,
                                    shuffle=False)

    sums, count = {}, 0
    for j, np_batch in enumerate(loader):
        if opt.maxSteps is not None and j >= opt.maxSteps:
            break
        losses = fwd(common.stage_batch(np_batch))
        for k, v in losses.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
        line = " ".join(f"{k} {sums[k]/count:.6f}" for k in sorted(sums))
        print(f"[{j}] accumulated: {line}")

    print("FINAL " + " ".join(f"{k}={sums[k]/max(count,1):.6f}"
                              for k in sorted(sums)))
    return {k: v / max(count, 1) for k, v in sums.items()}


if __name__ == "__main__":
    main()
