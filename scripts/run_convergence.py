"""From-scratch staged convergence runs on the procedural fixture.

Drives the REAL training CLIs end-to-end, chained exactly like the
reference's staged recipe (/root/reference/README.md:27-34,
trainBRDF.py:145-396 -> trainLight.py:215-244 ->
trainBRDFBilateral.py:264-342): generate a physically-consistent
fixture (data/fixture.py), train each stage from scratch at a reduced
operating point, and compare held-out TEST-split metrics against the
UNTRAINED initialization (same seed => identical init params).

Records, per stage: the train-loss curve (first/last rolling means +
ratio), init-vs-trained test metrics, and wall times, into
<out>/summary.json + a markdown table on stdout.  The committed results
live in BASELINE.md ("Convergence" section); the CI gate version is
tests/test_convergence.py.

Usage:
  python scripts/run_convergence.py --out /tmp/irois_conv \
      [--imHeight 120 --imWidth 160 --envRow 60 --envCol 80] \
      [--brdfEpochs 60] [--lightEpochs 20] [--bsEpochs 5]
"""

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def log(m):
    print(m, flush=True)


def curve_stats(exp, key="total"):
    """Loss history from the newest {key}Error_{epoch}.npy the CLI wrote."""
    import glob

    files = glob.glob(osp.join(exp, f"{key}Error_*.npy"))
    if not files:
        return None
    newest = max(files, key=lambda f: int(f.rsplit("_", 1)[1][:-4]))
    h = np.load(newest).ravel()
    k = max(1, min(20, len(h) // 10))
    return {
        "steps": int(len(h)),
        "first": float(h[:k].mean()),
        "last": float(h[-k:].mean()),
        "ratio": float(h[:k].mean() / max(h[-k:].mean(), 1e-12)),
    }


def _finetune_nyu_leg(opt, args, exp, prior, summary):
    """Fine-tune on the NYU fixture from the cascade-0 BRDF and compare
    held-out geometry metrics before/after (trainFineTuneNYU.py flow;
    eval = CompareNormal.py/CompareDepth.py metrics over the TEST list)."""
    import jax

    from inverserenderingofindoorscene_tpu.cli import train_finetune_nyu
    from inverserenderingofindoorscene_tpu.data.fixture import (
        write_nyu_fixture,
    )
    from inverserenderingofindoorscene_tpu.data.nyu import NYUDataset
    from inverserenderingofindoorscene_tpu.eval.metrics import (
        normal_angle_error,
        si_log_depth_rmse,
    )
    from inverserenderingofindoorscene_tpu.pipeline.brdf import (
        BRDFNets,
        brdf_forward,
    )
    from inverserenderingofindoorscene_tpu.train.steps import (
        create_train_state,
        reference_adam,
    )
    from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt

    if "finetune_nyu" in prior:
        log("[finetune_nyu] already recorded; skipping (resume)")
        summary["stages"]["finetune_nyu"] = prior["finetune_nyu"]
        return

    nyu_root = osp.join(opt.out, "nyu_fixture")
    write_nyu_fixture(nyu_root)
    nyu_args = [
        "--nyuImRoot", osp.join(nyu_root, "images"),
        "--nyuNormalRoot", osp.join(nyu_root, "normals"),
        "--nyuDepthRoot", osp.join(nyu_root, "depths"),
        "--nyuSegRoot", osp.join(nyu_root, "segs"),
        "--nyuList", osp.join(nyu_root, "NYUTrain.txt"),
        "--brdfExperiment", exp["brdf"],
    ]

    def eval_geometry(exp_dir, stage):
        nets = BRDFNets(cascade_level=0)
        params = nets.init(jax.random.PRNGKey(opt_seed()),
                           (opt.imHeight, opt.imWidth))
        epoch = ckpt.latest_epoch(exp_dir, stage, 0)
        assert epoch is not None, (exp_dir, stage)
        state = create_train_state(params, reference_adam(1e-4))
        state = ckpt.restore_checkpoint(exp_dir, stage, 0, epoch, state)
        fwd = jax.jit(lambda b: brdf_forward(nets, state.params, b))
        ds = NYUDataset(
            osp.join(nyu_root, "images"), osp.join(nyu_root, "normals"),
            osp.join(nyu_root, "depths"), osp.join(nyu_root, "segs"),
            osp.join(nyu_root, "NYUTest.txt"),
            im_hw=(opt.imHeight, opt.imWidth), phase="TEST",
        )
        angs, rmses = [], []
        for i in range(len(ds)):
            item = ds[i]
            batch = {"im": np.asarray(item["im"])[None]}
            preds = fwd(batch)
            npred = np.asarray(preds["normal"][0], np.float64)
            mean_deg, _ = normal_angle_error(
                npred, item["normal"], item["seg_normal"][:, :, 0]
            )
            angs.append(mean_deg)
            # NYU depth is recovered up to scale: median-align like the
            # si-log metric's mean subtraction handles the offset
            dpred = np.asarray(preds["depth"][0, :, :, 0], np.float64)
            rmses.append(si_log_depth_rmse(dpred, item["depth"][:, :, 0]))
        return {"normal_mean_deg": float(np.mean(angs)),
                "si_log_depth_rmse": float(np.mean(rmses))}

    def opt_seed():
        return opt.seed if hasattr(opt, "seed") else 0

    rec = {"init_test": eval_geometry(exp["brdf"], "brdf")}
    t1 = time.time()
    nyu_exp = osp.join(opt.out, "finetune_nyu_main")
    train_finetune_nyu.main(
        args(["--experiment", nyu_exp] + nyu_args, opt.nyuBatch,
             opt.nyuEpochs)
    )
    rec["train_s"] = round(time.time() - t1, 1)
    rec["loss"] = curve_stats(nyu_exp, key="nyu_total")
    rec["trained_test"] = eval_geometry(nyu_exp, "nyu")
    rec["test_improvement"] = {
        k: round(rec["init_test"][k] / max(rec["trained_test"][k], 1e-12), 2)
        for k in rec["init_test"]
    }
    summary["stages"]["finetune_nyu"] = rec
    log(f"[finetune_nyu] loss {rec['loss']} | init {rec['init_test']} | "
        f"trained {rec['trained_test']} | x-better {rec['test_improvement']}"
        f" | {rec['train_s']}s")


def _finetune_iiw_leg(opt, args, exp, prior, summary):
    """Fine-tune on the IIW fixture from the cascade-0 BRDF (alternating
    synthetic/IIW ranking-loss batches, trainFineTuneIIW.py:147-263 flow)
    and compare held-out WHDR (CompareWHDR.py:8-66, delta=0.1) over the
    TEST list before/after."""
    import jax

    from inverserenderingofindoorscene_tpu.cli import train_finetune_iiw
    from inverserenderingofindoorscene_tpu.data.fixture import (
        write_iiw_fixture,
    )
    from inverserenderingofindoorscene_tpu.eval.metrics import compute_whdr
    from inverserenderingofindoorscene_tpu.pipeline.brdf import (
        BRDFNets,
        brdf_forward,
    )
    from inverserenderingofindoorscene_tpu.train.steps import (
        create_train_state,
        reference_adam,
    )
    from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt

    if "finetune_iiw" in prior:
        log("[finetune_iiw] already recorded; skipping (resume)")
        summary["stages"]["finetune_iiw"] = prior["finetune_iiw"]
        return

    iiw_root = osp.join(opt.out, "iiw_fixture")
    # 4*(H, W) keeps the network's aspect: the loader's aspect-preserving
    # resize then needs no crop, so judgement coordinates survive exactly
    write_iiw_fixture(iiw_root, frame_hw=(4 * opt.imHeight, 4 * opt.imWidth))
    iiw_args = [
        "--iiwRoot", iiw_root,
        "--iiwList", osp.join(iiw_root, "IIWTrain.txt"),
        "--brdfExperiment", exp["brdf"],
    ]

    def eval_whdr(exp_dir, stage):
        from PIL import Image

        nets = BRDFNets(cascade_level=0)
        params = nets.init(jax.random.PRNGKey(opt.seed if hasattr(
            opt, "seed") else 0), (opt.imHeight, opt.imWidth))
        epoch = ckpt.latest_epoch(exp_dir, stage, 0)
        assert epoch is not None, (exp_dir, stage)
        state = create_train_state(params, reference_adam(1e-4))
        state = ckpt.restore_checkpoint(exp_dir, stage, 0, epoch, state)
        fwd = jax.jit(lambda b: brdf_forward(nets, state.params, b))
        with open(osp.join(iiw_root, "IIWTest.txt")) as f:
            names = [x.strip() for x in f if x.strip()]
        whdrs = []
        for name in names:
            im = Image.open(osp.join(iiw_root, name)).resize(
                [opt.imWidth, opt.imHeight], Image.LANCZOS)
            im = (np.asarray(im, np.float32) / 255.0) ** 2.2
            im = im / im.max()  # the loader's normalization (iiw.py)
            preds = fwd({"im": im[None]})
            # brdf_forward already maps the albedo head to [0,1]
            # (pipeline/brdf.py:170,178, one application of 0.5*(x+1)
            # like the reference wrapperIIW.py:83) — use it directly
            refl = np.asarray(preds["albedo"][0], np.float64)
            with open(osp.join(iiw_root,
                               name.replace(".png", ".json"))) as f:
                res = compute_whdr(refl, json.load(f))
            whdrs.append(res[0])
        return {"whdr": float(np.mean(whdrs))}

    rec = {"init_test": eval_whdr(exp["brdf"], "brdf")}
    t1 = time.time()
    iiw_exp = osp.join(opt.out, "finetune_iiw_main")
    train_finetune_iiw.main(
        args(["--experiment", iiw_exp] + iiw_args, opt.iiwBatch,
             opt.iiwEpochs)
    )
    rec["train_s"] = round(time.time() - t1, 1)
    rec["loss"] = curve_stats(iiw_exp, key="iiw_total")
    rec["trained_test"] = eval_whdr(iiw_exp, "iiw")
    rec["test_improvement"] = {
        k: round(rec["init_test"][k] / max(rec["trained_test"][k], 1e-12), 2)
        for k in rec["init_test"]
    }
    summary["stages"]["finetune_iiw"] = rec
    log(f"[finetune_iiw] loss {rec['loss']} | init {rec['init_test']} | "
        f"trained {rec['trained_test']} | x-better {rec['test_improvement']}"
        f" | {rec['train_s']}s")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/irois_conv")
    ap.add_argument("--imHeight", type=int, default=120)
    ap.add_argument("--imWidth", type=int, default=160)
    ap.add_argument("--envRow", type=int, default=60)
    ap.add_argument("--envCol", type=int, default=80)
    ap.add_argument("--scenes", type=int, default=5)
    ap.add_argument("--perScene", type=int, default=12)
    ap.add_argument("--brdfEpochs", type=int, default=60)
    ap.add_argument("--brdfBatch", type=int, default=8)
    ap.add_argument("--lightEpochs", type=int, default=20)
    ap.add_argument("--lightBatch", type=int, default=4)
    ap.add_argument("--bsEpochs", type=int, default=5)
    ap.add_argument("--bsBatch", type=int, default=2)
    ap.add_argument("--stages", nargs="+",
                    default=["brdf", "light", "bilateral"])
    ap.add_argument("--cascade1", action="store_true",
                    help="after the cascade-0 stages: export intermediates "
                         "(output_brdf_light, both splits) and run the "
                         "cascade-1 BRDF + light convergence legs — the "
                         "full staged recipe (README.md:27-34)")
    ap.add_argument("--brdf1Epochs", type=int, default=30)
    ap.add_argument("--light1Epochs", type=int, default=10)
    ap.add_argument("--finetuneNYU", action="store_true",
                    help="after the cascade-0 BRDF: fine-tune on a "
                         "generated NYU-format fixture (alternating "
                         "synthetic/NYU batches, trainFineTuneNYU.py) and "
                         "record held-out normal-angle / si-log-depth "
                         "improvement over the un-finetuned BRDF")
    ap.add_argument("--nyuEpochs", type=int, default=8)
    ap.add_argument("--nyuBatch", type=int, default=4)
    ap.add_argument("--finetuneIIW", action="store_true",
                    help="after the cascade-0 BRDF: fine-tune on a "
                         "generated IIW-format fixture (alternating "
                         "synthetic/ranking-loss batches, "
                         "trainFineTuneIIW.py) and record held-out WHDR "
                         "improvement over the un-finetuned BRDF")
    ap.add_argument("--iiwEpochs", type=int, default=8)
    ap.add_argument("--iiwBatch", type=int, default=4)
    ap.add_argument("--computeDtype", default="bfloat16")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"],
                    help="force the cpu backend (the container's "
                         "sitecustomize pins the axon TPU otherwise)")
    opt = ap.parse_args(argv)

    if opt.platform == "cpu":
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from inverserenderingofindoorscene_tpu.cli import (
        test_synthetic,
        train_bilateral,
        train_brdf,
        train_light,
    )
    from inverserenderingofindoorscene_tpu.data.fixture import (
        write_openrooms_fixture,
    )

    root = osp.join(opt.out, "fixture")
    t0 = time.time()
    write_openrooms_fixture(
        root, n_scenes=opt.scenes, per_scene=opt.perScene,
        n_test_scenes=1, im_hw=(opt.imHeight, opt.imWidth),
        env_rc=(opt.envRow, opt.envCol),
    )
    log(f"fixture: {opt.scenes}x{opt.perScene} train + "
        f"1x{opt.perScene} test images in {time.time() - t0:.0f}s")

    def args(extra, bs, epochs, max_steps=None):
        a = [
            "--dataRoot", root,
            "--imHeight", str(opt.imHeight), "--imWidth", str(opt.imWidth),
            "--envRow", str(opt.envRow), "--envCol", str(opt.envCol),
            "--batchSize", str(bs), "--nepoch", str(epochs),
            "--numWorkers", "2", "--itemCache", osp.join(opt.out, "cache"),
            "--saveEvery", "10",
        ]
        if max_steps is not None:
            a += ["--maxSteps", str(max_steps)]
        return a + extra

    # resumable: a stage already recorded in <out>/summary.json is kept
    # (the axon tunnel can wedge mid-run — kill + rerun continues)
    prior = {}
    sj = osp.join(opt.out, "summary.json")
    if osp.isfile(sj):
        with open(sj) as f:
            prior = json.load(f).get("stages", {})
    summary = {"config": vars(opt), "stages": {}}
    exp = {}

    def dump_summary():
        # persisted after EVERY stage so a wedged-tunnel kill + rerun
        # resumes at stage granularity, not from scratch.  prior stages
        # not yet re-reached in program order are merged in, so a crash
        # mid-rerun never discards previously recorded results
        merged = dict(prior)
        merged.update(summary["stages"])
        with open(sj, "w") as f:
            json.dump({**summary, "stages": merged}, f, indent=1)

    def run_stage(name, train_main, bs, epochs, extra_train, eval_extra,
                  eval_keys, stage=None):
        stage = stage or name
        main_exp0 = osp.join(opt.out, f"{name}_main")
        if name in prior:
            log(f"[{name}] already recorded; skipping (resume)")
            summary["stages"][name] = prior[name]
            exp[name] = main_exp0
            return
        rec = {}
        # 1) init checkpoint (0 steps; same seed => the training run's
        #    exact init params) + held-out eval of the UNTRAINED nets
        init_exp = osp.join(opt.out, f"{name}_init")
        train_main(args(["--experiment", init_exp] + extra_train,
                        bs, 1, max_steps=0))
        m0 = test_synthetic.main(args(
            ["--stage", stage,
             "--testRoot", osp.join(opt.out, f"test_{name}_init")]
            + eval_extra(init_exp), bs, 1))
        rec["init_test"] = {k: _scalar(m0[k]) for k in eval_keys}
        # 2) the real run
        t1 = time.time()
        main_exp = osp.join(opt.out, f"{name}_main")
        train_main(args(["--experiment", main_exp] + extra_train,
                        bs, epochs))
        rec["train_s"] = round(time.time() - t1, 1)
        rec["loss"] = curve_stats(main_exp)
        # 3) held-out eval of the trained nets
        m1 = test_synthetic.main(args(
            ["--stage", stage,
             "--testRoot", osp.join(opt.out, f"test_{name}_main")]
            + eval_extra(main_exp), bs, 1))
        rec["trained_test"] = {k: _scalar(m1[k]) for k in eval_keys}
        rec["test_improvement"] = {
            k: round(rec["init_test"][k] / max(rec["trained_test"][k],
                                               1e-12), 2)
            for k in eval_keys
        }
        exp[name] = main_exp
        summary["stages"][name] = rec
        dump_summary()
        log(f"[{name}] loss {rec['loss']} | init {rec['init_test']} | "
            f"trained {rec['trained_test']} | x-better "
            f"{rec['test_improvement']} | {rec['train_s']}s")

    def _scalar(v):
        a = np.asarray(v, np.float64).ravel()
        return float(a[-1] if a.size > 1 else a[0])  # bilateral: [raw, bs]

    dt = ["--computeDtype", opt.computeDtype]

    if "brdf" in opt.stages:
        run_stage("brdf", train_brdf.main, opt.brdfBatch, opt.brdfEpochs,
                  dt + ["--previewEvery", "0"],
                  lambda e: ["--brdfExperiment", e],
                  ["albedo", "normal", "rough", "depth"])
    if "light" in opt.stages:
        brdf_args = (["--brdfExperiment", exp["brdf"]]
                     if "brdf" in exp else [])
        run_stage("light", train_light.main, opt.lightBatch,
                  opt.lightEpochs, dt + brdf_args,
                  lambda e: ["--lightExperiment", e] + brdf_args,
                  ["reconst", "render"])
    if "bilateral" in opt.stages:
        brdf_args = (["--brdfExperiment", exp["brdf"]]
                     if "brdf" in exp else [])
        run_stage("bilateral", train_bilateral.main, opt.bsBatch,
                  opt.bsEpochs, brdf_args,
                  lambda e: ["--bsExperiment", e] + brdf_args,
                  ["albedo_bs", "rough_bs", "depth_bs"])

    if opt.cascade1 and "brdf" in exp and "light" in exp:
        from inverserenderingofindoorscene_tpu.cli import output_brdf_light

        handoff = ["--brdfExperiment", exp["brdf"],
                   "--lightExperiment", exp["light"]]
        if "brdf1" not in prior:
            # cascade hand-off: write the six *_0.h5 intermediates next to
            # the fixture files (skip-existing, outputBRDFLight.py:253-301)
            for mode in ("TRAIN", "TEST"):
                log(f"exporting cascade-0 intermediates ({mode}) ...")
                output_brdf_light.main(
                    args(["--mode", mode] + handoff, 2, 1))
        c1 = ["--cascadeLevel", "1"]
        run_stage("brdf1", train_brdf.main, opt.brdfBatch, opt.brdf1Epochs,
                  dt + c1 + ["--previewEvery", "0"],
                  lambda e: ["--brdfExperiment", e] + c1,
                  ["albedo", "normal", "rough", "depth"], stage="brdf")
        brdf1_args = ["--brdfExperiment", exp["brdf1"]]
        run_stage("light1", train_light.main, opt.lightBatch,
                  opt.light1Epochs, dt + c1 + brdf1_args,
                  lambda e: ["--lightExperiment", e] + brdf1_args + c1,
                  ["reconst", "render"], stage="light")

    if opt.finetuneNYU and "brdf" in exp:
        _finetune_nyu_leg(opt, args, exp, prior, summary)
        dump_summary()
    if opt.finetuneIIW and "brdf" in exp:
        _finetune_iiw_leg(opt, args, exp, prior, summary)
        dump_summary()

    dump_summary()
    log("\n| stage | steps | loss first->last (ratio) | test init -> trained |")
    log("|---|---|---|---|")
    for name, rec in summary["stages"].items():
        c = rec["loss"] or {"steps": 0, "first": float("nan"),
                            "last": float("nan"), "ratio": float("nan")}
        tt = ", ".join(
            f"{k} {rec['init_test'][k]:.4g}->{rec['trained_test'][k]:.4g}"
            for k in rec["trained_test"])
        log(f"| {name} | {c['steps']} | {c['first']:.4g} -> {c['last']:.4g} "
            f"({c['ratio']:.1f}x) | {tt} |")
    log(f"summary: {osp.join(opt.out, 'summary.json')}")
    return summary


if __name__ == "__main__":
    main()
