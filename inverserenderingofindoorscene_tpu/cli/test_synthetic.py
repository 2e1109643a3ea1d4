"""Held-out-split evaluation driver (testBRDF / testLight / testBRDFBilateral).

Computes the masked error metrics over the TEST split and leaves the same
artifact family on disk as the reference test drivers
(/root/reference/testBRDF.py, testLight.py, testBRDFBilateral.py):

  * ``testingLog_{epoch}.txt`` — per-iteration error lines plus the running
    accumulated means, in the reference's ``[epoch/j] name:v .`` format
    (testBRDF.py:128,257-278 via utils.writeErrToFile);
  * ``{key}Error_{epoch}.npy`` — the per-iteration error record
    (testBRDF.py:313-316); for the bilateral stage each row is the
    two-column [raw, refined] pair (testBRDFBilateral.py:179-183);
  * per-batch prediction/GT image grids and envmap mosaics
    (testBRDF.py:282-310, testLight.py:293-309), cadence ``--imageEvery``.

Note the envmap log offset is 1e-3 at eval (testLight.py:222).

Usage: python -m inverserenderingofindoorscene_tpu.cli.test_synthetic \
    --stage light --dataRoot ...
"""

from __future__ import annotations

import functools
import os
import os.path as osp

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
    p.add_argument("--testRoot", default=None,
                   help="artifact output dir (default test_<stage>_"
                        "cascade<L>)")
    p.add_argument("--imageEvery", type=int, default=1,
                   help="dump image grids every N batches; 0 disables")
    p.set_defaults(batchSize=4)
    return p.parse_args(argv)


def _depth_viz(d):
    """The reference's depth visualization: 1/clamp(d+1, 1e-6, 10)
    (testBRDF.py:288,299)."""
    return 1.0 / np.clip(np.asarray(d) + 1.0, 1e-6, 10.0)


class _ErrLog:
    """testingLog + per-iteration error record (testBRDF.py:126-316)."""

    def __init__(self, test_root, epoch):
        self.epoch = epoch
        self.rows = {}
        self.fh = open(
            osp.join(test_root, f"testingLog_{epoch}.txt"), "w"
        )

    def _fmt(self, name, vals, j):
        txt = f"[{self.epoch}/{j}] {name}:" + "".join(
            f"{v:.6f} " for v in np.atleast_1d(vals)
        ) + "."
        return txt

    def record(self, j, errors: dict):
        """errors: name -> scalar, or a [raw, bs] pair (bilateral stage)."""
        for name, v in errors.items():
            row = np.atleast_1d(np.asarray(v, np.float32))
            self.rows.setdefault(name, []).append(row)
            line = self._fmt(name, row, j)
            print(line)
            self.fh.write(line + "\n")
        for name in errors:
            acc = np.mean(np.stack(self.rows[name]), axis=0)
            line = self._fmt(name + "Accu", acc, j)
            print(line)
            self.fh.write(line + "\n")

    def save(self, test_root):
        self.fh.close()
        for name, rows in self.rows.items():
            np.save(
                osp.join(test_root, f"{name}Error_{self.epoch}.npy"),
                np.stack(rows),
            )

    def means(self):
        """Per-key accumulated means; two-column [raw, refined] records
        (the bilateral stage, testBRDFBilateral.py:179-183) keep their
        columns as separate {name}_raw / {name}_bs entries instead of
        averaging physically different quantities together."""
        out = {}
        for k, v in self.rows.items():
            acc = np.mean(np.stack(v), axis=0)
            if acc.size == 2:
                out[f"{k}_raw"] = float(acc[0])
                out[f"{k}_bs"] = float(acc[1])
            else:
                out[k] = float(np.mean(acc))
        return out


def main(argv=None):
    opt = parse_args(argv)
    rng = common.pin_seeds(opt.seed)
    k1, k2 = jax.random.split(rng)
    brdf_nets, brdf_params = load_frozen_brdf(opt, k1)

    test_root = opt.testRoot or f"test_{opt.stage}_cascade{opt.cascadeLevel}"
    os.makedirs(test_root, exist_ok=True)

    if opt.stage == "brdf":
        epoch = opt.brdfEpoch
        if epoch is None:
            epoch = ckpt.latest_epoch(
                opt.brdfExperiment
                or common.default_experiment_name(opt, "brdf"),
                "brdf", opt.cascadeLevel,
            )

        # params ride as jit args: closed-over trees embed as HLO
        # constants and bloat/overflow the remote compile request
        def run(bp, b):
            preds, errors = brdf_step(brdf_nets, bp, b)
            return errors, preds

        fwd = functools.partial(jax.jit(run), jax.device_put(brdf_params))
        loader = common.make_loader(opt, "TEST", is_light=False,
                                    shuffle=False)
    elif opt.stage == "light":
        light_nets = LightNets(
            sg_num=opt.SGNum, cascade_level=opt.cascadeLevel,
            env_rows=opt.envRow, env_cols=opt.envCol,
            env_height=opt.envHeight, env_width=opt.envWidth,
        )
        light_params = load_frozen_light(opt, k2, light_nets)
        epoch = opt.lightEpoch
        if epoch is None:
            epoch = ckpt.latest_epoch(
                opt.lightExperiment
                or common.default_experiment_name(
                    opt, "light", offset=opt.trainOffset
                ),
                "light", opt.cascadeLevel,
            )

        def run(ps, b):
            losses, aux = light_step(
                brdf_nets, light_nets, ps[0], ps[1], b,
                offset=opt.offset,
            )
            return losses, {
                "env_scaled": aux["env_scaled"],
                "rendered": aux["rendered"],
            }

        fwd = functools.partial(
            jax.jit(run), jax.device_put((brdf_params, light_params))
        )
        loader = common.make_loader(opt, "TEST", is_light=True, shuffle=False)
    else:
        bs_nets = BilateralNets()
        bs_params = bs_nets.init(k2, (opt.imHeight, opt.imWidth))
        exp = opt.bsExperiment or common.default_experiment_name(opt, "bs")
        epoch = opt.bsEpoch
        if epoch is None:
            epoch = ckpt.latest_epoch(exp, "bs", opt.cascadeLevel)
        if epoch is not None:
            state = create_train_state(bs_params, reference_adam(1e-4))
            state = ckpt.restore_checkpoint(exp, "bs", opt.cascadeLevel,
                                            epoch, state)
            bs_params = state.params

        def run(ps, b):
            losses, aux = bilateral_step(
                brdf_nets, bs_nets, ps[0], ps[1], b
            )
            return losses, {"raw": aux["preds"], "bs": aux["refined"]}

        fwd = functools.partial(
            jax.jit(run), jax.device_put((brdf_params, bs_params))
        )
        loader = common.make_loader(opt, "TEST", is_light=False,
                                    shuffle=False)

    epoch = epoch if epoch is not None else 0
    elog = _ErrLog(test_root, epoch)

    for j, np_batch in enumerate(loader):
        if opt.maxSteps is not None and j >= opt.maxSteps:
            break
        batch = common.stage_batch(np_batch)
        losses, extras = fwd(batch)
        losses = {k: float(v) for k, v in losses.items()}

        if opt.stage == "bilateral":
            # two-column [raw, refined] rows (testBRDFBilateral.py:179-183)
            rec = {
                k: np.array([losses[f"{k}_raw"], losses[f"{k}_bs"]])
                for k in ("albedo", "rough", "depth")
            }
            rec["normal"] = losses["normal_raw"]
        else:
            rec = losses
        elog.record(j, rec)

        if opt.imageEvery and j % opt.imageEvery == 0:
            _dump_images(opt, test_root, j, batch, extras)

    elog.save(test_root)
    means = elog.means()
    print("FINAL " + " ".join(f"{k}={v:.6f}" for k, v in sorted(means.items())))
    return means


def _dump_images(opt, test_root, j, batch, extras):
    """Per-batch prediction/GT grids (testBRDF.py:282-310,
    testLight.py:293-309)."""
    from inverserenderingofindoorscene_tpu.utils.io import (
        write_envmap_mosaic,
        write_image_grid,
    )

    def grid(name, arr, gamma=False):
        write_image_grid(
            np.asarray(jax.device_get(arr)),
            osp.join(test_root, f"{j}_{name}.png"), gamma=gamma,
        )

    grid("im", batch["im"], gamma=True)
    if opt.stage in ("brdf", "bilateral"):
        tagged = (
            [("Pred", extras)] if opt.stage == "brdf"
            else [("Pred", extras["raw"]), ("Bs", extras["bs"])]
        )
        grid("albedoGt_0", batch["albedo"], gamma=True)
        grid("normalGt_0", 0.5 * (np.asarray(batch["normal"]) + 1.0))
        grid("roughGt_0", 0.5 * (np.asarray(batch["rough"]) + 1.0))
        grid("depthGt_0", _depth_viz(batch["depth"]))
        for tag, preds in tagged:
            grid(f"albedo{tag}_0", preds["albedo"], gamma=True)
            grid(f"normal{tag}_0",
                 0.5 * (np.asarray(jax.device_get(preds["normal"])) + 1.0))
            grid(f"rough{tag}_0",
                 0.5 * (np.asarray(jax.device_get(preds["rough"])) + 1.0))
            grid(f"depth{tag}_0", _depth_viz(jax.device_get(preds["depth"])))
    else:
        grid("imRendered", extras["rendered"], gamma=True)
        env = np.asarray(jax.device_get(extras["env_scaled"]))  # [B,R,C,D,3]
        write_envmap_mosaic(
            env[0].reshape(
                env.shape[1], env.shape[2], opt.envHeight, opt.envWidth, 3
            ),
            osp.join(test_root, f"{j}_envmapPred.png"),
            env_height=opt.envHeight, env_width=opt.envWidth,
        )


if __name__ == "__main__":
    main()
