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
import os
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


_JITS = {}  # (kind, cascade, dims) -> compiled program, params as args


def _brdf_forward_fn(opt, exp, exp_dir, stage, cascade):
    """Jitted im->preds forward of the checkpointed BRDF at either
    cascade.  At cascade 1 the TRAINED cascade-0 BRDF+Light stacks
    (exp['brdf'], exp['light']) synthesize the *_pre inputs inline, the
    same flow the cascade-1 fine-tune drivers use
    (trainFineTuneIIW_cascade1.py:300-362).  The jitted programs take
    params as ARGUMENTS and are cached in _JITS, so the init and
    trained evals of every leg share ONE compile per program (these are
    the recipe's longest compiles — each avoided recompile is also one
    fewer tunnel-wedge window)."""
    import jax

    from inverserenderingofindoorscene_tpu.pipeline.brdf import (
        BRDFNets,
        brdf_forward,
    )
    from inverserenderingofindoorscene_tpu.train.steps import (
        create_train_state,
        reference_adam,
    )
    from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt

    nets = BRDFNets(cascade_level=cascade)
    params = nets.init(jax.random.PRNGKey(0), (opt.imHeight, opt.imWidth))
    epoch = ckpt.latest_epoch(exp_dir, stage, cascade)
    assert epoch is not None, (exp_dir, stage, cascade)
    state = create_train_state(params, reference_adam(1e-4))
    state = ckpt.restore_checkpoint(exp_dir, stage, cascade, epoch, state)
    # params enter as jit ARGUMENTS: closed-over weights (numpy OR
    # jax.Array) lower to HLO constants, and the frozen c0 BRDF+Light
    # stack is ~400 MB of conv kernels — the axon tunnel's
    # /remote_compile rejects the request body (HTTP 413; observed as a
    # stalled 4.2 MB Send-Q mid-upload)
    brdf_params = jax.device_put(state.params)
    fkey = ("fwd", cascade, opt.imHeight, opt.imWidth)
    if fkey not in _JITS:
        fnets = nets
        _JITS[fkey] = jax.jit(lambda p, b: brdf_forward(fnets, p, b))
    fwd = _JITS[fkey]
    if cascade == 0:
        return lambda b: fwd(brdf_params, b)

    from types import SimpleNamespace

    from inverserenderingofindoorscene_tpu.cli import common as cli_common
    from inverserenderingofindoorscene_tpu.pipeline.finetune import (
        synthesize_pre,
    )

    ns = SimpleNamespace(
        cascadeLevel=1, imHeight=opt.imHeight, imWidth=opt.imWidth,
        envRow=opt.envRow, envCol=opt.envCol, envHeight=8, envWidth=16,
        SGNum=12, seed=0, brdfExperiment=None, brdfEpoch=None,
        brdf0Experiment=exp["brdf"], brdf0Epoch=None,
        light0Experiment=exp["light"], light0Epoch=None,
    )
    bn0, ln0, bp0, lp0 = cli_common.load_frozen_cascade0(
        ns, jax.random.PRNGKey(7))
    # two programs (like the fine-tune CLIs), frozen params as arguments
    skey = ("synth", opt.imHeight, opt.imWidth, opt.envRow, opt.envCol)
    if skey not in _JITS:
        _JITS[skey] = jax.jit(
            lambda bp, lp, b: synthesize_pre(bn0, ln0, bp, lp, b))
    synth = _JITS[skey]
    return lambda b: fwd(brdf_params, synth(bp0, lp0, b))


def _finetune_c1_args(exp):
    return ["--cascadeLevel", "1", "--brdfExperiment", exp["brdf1"],
            "--brdf0Experiment", exp["brdf"],
            "--light0Experiment", exp["light"]]


def _finetune_nyu_leg(opt, args, exp, prior, summary, cascade=0):
    """Fine-tune on the NYU fixture from the cascade-``cascade`` BRDF and
    compare held-out geometry metrics before/after (trainFineTuneNYU.py /
    trainFineTuneNYU_cascade1.py:311-374 flows; eval = CompareNormal.py /
    CompareDepth.py metrics over the TEST list)."""
    import numpy as np

    from inverserenderingofindoorscene_tpu.cli import train_finetune_nyu
    from inverserenderingofindoorscene_tpu.data.fixture import (
        write_nyu_fixture,
    )
    from inverserenderingofindoorscene_tpu.data.nyu import NYUDataset
    from inverserenderingofindoorscene_tpu.eval.metrics import (
        normal_angle_error,
        si_log_depth_rmse,
    )

    leg = "finetune_nyu1" if cascade else "finetune_nyu"
    if leg in prior:
        log(f"[{leg}] already recorded; skipping (resume)")
        summary["stages"][leg] = prior[leg]
        return

    nyu_root = osp.join(opt.out, "nyu_fixture")
    # 4*(H, W) keeps the photos at the network aspect (== the NYU-native
    # 480x640 at the flagship 120x160 operating point; SQUARE at the
    # 64x64 CI point, where a 4:3 photo would aspect-scale the lighting
    # grid below the light encoder's 6-level minimum in test_real)
    write_nyu_fixture(nyu_root,
                      frame_hw=(4 * opt.imHeight, 4 * opt.imWidth))
    nyu_args = [
        "--nyuImRoot", osp.join(nyu_root, "images"),
        "--nyuNormalRoot", osp.join(nyu_root, "normals"),
        "--nyuDepthRoot", osp.join(nyu_root, "depths"),
        "--nyuSegRoot", osp.join(nyu_root, "segs"),
        "--nyuList", osp.join(nyu_root, "NYUTrain.txt"),
    ]
    nyu_args += (_finetune_c1_args(exp) if cascade
                 else ["--brdfExperiment", exp["brdf"]])

    def eval_geometry(exp_dir, stage):
        fwd = _brdf_forward_fn(opt, exp, exp_dir, stage, cascade)
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

    init_dir = exp["brdf1"] if cascade else exp["brdf"]
    rec = {"init_test": eval_geometry(init_dir, "brdf")}
    t1 = time.time()
    nyu_exp = osp.join(opt.out, f"{leg}_main")
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
    summary["stages"][leg] = rec
    log(f"[{leg}] loss {rec['loss']} | init {rec['init_test']} | "
        f"trained {rec['trained_test']} | x-better {rec['test_improvement']}"
        f" | {rec['train_s']}s")


def _eval_whdr(opt, exp, iiw_root, exp_dir, stage, cascade):
    """Held-out WHDR (CompareWHDR.py:8-66, delta=0.1) of the checkpointed
    BRDF over the IIW fixture TEST list.  brdf_forward already maps the
    albedo head to [0,1] (pipeline/brdf.py:170,178, one application of
    0.5*(x+1) like the reference wrapperIIW.py:83) — it IS the
    reflectance."""
    import numpy as np
    from PIL import Image

    from inverserenderingofindoorscene_tpu.eval.metrics import compute_whdr

    fwd = _brdf_forward_fn(opt, exp, exp_dir, stage, cascade)
    with open(osp.join(iiw_root, "IIWTest.txt")) as f:
        names = [x.strip() for x in f if x.strip()]
    whdrs = []
    for name in names:
        im = Image.open(osp.join(iiw_root, name)).resize(
            [opt.imWidth, opt.imHeight], Image.LANCZOS)
        im = (np.asarray(im, np.float32) / 255.0) ** 2.2
        im = im / im.max()  # the loader's normalization (iiw.py)
        preds = fwd({"im": im[None]})
        refl = np.asarray(preds["albedo"][0], np.float64)
        with open(osp.join(iiw_root, name.replace(".png", ".json"))) as f:
            res = compute_whdr(refl, json.load(f))
        whdrs.append(res[0])
    return {"whdr": float(np.mean(whdrs))}


def _finetune_iiw_leg(opt, args, exp, prior, summary, cascade=0):
    """Fine-tune on the IIW fixture from the cascade-``cascade`` BRDF
    (alternating synthetic/IIW ranking-loss batches,
    trainFineTuneIIW.py:147-263 / trainFineTuneIIW_cascade1.py:300-362)
    and compare held-out WHDR over the TEST list before/after."""
    from inverserenderingofindoorscene_tpu.cli import train_finetune_iiw
    from inverserenderingofindoorscene_tpu.data.fixture import (
        write_iiw_fixture,
    )

    leg = "finetune_iiw1" if cascade else "finetune_iiw"
    if leg in prior:
        log(f"[{leg}] already recorded; skipping (resume)")
        summary["stages"][leg] = prior[leg]
        return

    iiw_root = osp.join(opt.out, "iiw_fixture")
    # 4*(H, W) keeps the network's aspect: the loader's aspect-preserving
    # resize then needs no crop, so judgement coordinates survive exactly
    write_iiw_fixture(iiw_root, frame_hw=(4 * opt.imHeight, 4 * opt.imWidth))
    iiw_args = ["--iiwRoot", iiw_root,
                "--iiwList", osp.join(iiw_root, "IIWTrain.txt")]
    iiw_args += (_finetune_c1_args(exp) if cascade
                 else ["--brdfExperiment", exp["brdf"]])

    init_dir = exp["brdf1"] if cascade else exp["brdf"]
    rec = {"init_test": _eval_whdr(opt, exp, iiw_root, init_dir, "brdf",
                                   cascade)}
    t1 = time.time()
    iiw_exp = osp.join(opt.out, f"{leg}_main")
    train_finetune_iiw.main(
        args(["--experiment", iiw_exp] + iiw_args, opt.iiwBatch,
             opt.iiwEpochs)
    )
    rec["train_s"] = round(time.time() - t1, 1)
    rec["loss"] = curve_stats(iiw_exp, key="iiw_total")
    rec["trained_test"] = _eval_whdr(opt, exp, iiw_root, iiw_exp, "iiw",
                                     cascade)
    rec["test_improvement"] = {
        k: round(rec["init_test"][k] / max(rec["trained_test"][k], 1e-12), 2)
        for k in rec["init_test"]
    }
    summary["stages"][leg] = rec
    log(f"[{leg}] loss {rec['loss']} | init {rec['init_test']} | "
        f"trained {rec['trained_test']} | x-better {rec['test_improvement']}"
        f" | {rec['train_s']}s")


def _capstone_leg(opt, exp, prior, summary):
    """Trained-weights product capstone (VERDICT r4 missing #1): feed the
    TRAINED checkpoints through the FULL serving chain — test_real over
    held-out fixture photos (both cascades + lighting + bilateral
    refinement, the runReal20.sh / testReal.py:356-540 flow), then the
    benchmark-metric CLIs on the written products (CompareWHDR.py:70-112,
    CompareNormal.py, CompareDepth.py) — and record trained-vs-init
    product-level metrics.  The init products come from the SAME chain
    over the recipe's step-0 init checkpoints."""
    from inverserenderingofindoorscene_tpu.cli import compare, test_real
    from inverserenderingofindoorscene_tpu.data.fixture import (
        write_iiw_fixture,
        write_nyu_fixture,
    )

    if "capstone" in prior:
        log("[capstone] already recorded; skipping (resume)")
        summary["stages"]["capstone"] = prior["capstone"]
        return

    iiw_root = osp.join(opt.out, "iiw_fixture")
    write_iiw_fixture(iiw_root, frame_hw=(4 * opt.imHeight, 4 * opt.imWidth))
    nyu_root = osp.join(opt.out, "nyu_fixture")
    write_nyu_fixture(nyu_root,
                      frame_hw=(4 * opt.imHeight, 4 * opt.imWidth))

    level = 2 if "brdf1" in exp else 1
    lvl = level - 1  # products are written with 0-based level suffixes

    # hard-fail on missing stage checkpoints: test_real's loaders fall
    # back to random frozen nets with a WARNING, which would silently
    # record products of an untrained Light/BS stack as the capstone
    need = ["brdf", "light", "bilateral"] + (
        ["brdf1", "light1"] if level == 2 else [])
    for s in need:
        for suffix in ("init", "main"):
            d = osp.join(opt.out, f"{s}_{suffix}")
            assert osp.isdir(d), (
                f"capstone needs the {s} stage's {suffix} checkpoints; "
                f"{d} missing — run the recipe with its stages enabled")

    # held-out photo set: IIW TEST pngs (WHDR judgements) + NYU TEST
    # frames (normal/depth GT)
    paths = []
    with open(osp.join(iiw_root, "IIWTest.txt")) as f:
        paths += [osp.join(iiw_root, x.strip()) for x in f if x.strip()]
    with open(osp.join(nyu_root, "NYUTest.txt")) as f:
        paths += [osp.join(nyu_root, "images", x.strip())
                  for x in f if x.strip()]
    lst = osp.join(opt.out, "capstone_imlist.txt")
    with open(lst, "w") as f:
        f.write("\n".join(paths) + "\n")

    def serve(tag, suffix):
        outdir = osp.join(opt.out, f"capstone_{tag}")
        argv = [
            "--imList", lst, "--output", outdir,
            "--level", str(level), "--isLight", "--isBS",
            "--imHeight", str(opt.imHeight), "--imWidth", str(opt.imWidth),
            "--envRow", str(opt.envRow), "--envCol", str(opt.envCol),
            "--experimentBRDF0", osp.join(opt.out, f"brdf_{suffix}"),
            "--experimentLight0", osp.join(opt.out, f"light_{suffix}"),
            "--bsExperiment", osp.join(opt.out, f"bilateral_{suffix}"),
        ]
        if level == 2:
            argv += [
                "--experimentBRDF1", osp.join(opt.out, f"brdf1_{suffix}"),
                "--experimentLight1", osp.join(opt.out, f"light1_{suffix}"),
            ]
        test_real.main(argv)
        # the reference evaluates the BS-refined albedo/depth products
        # and the raw normal (CompareWHDR.py:72, CompareDepth.py:10)
        return {
            "whdr": float(compare.main([
                "whdr", "--predRoot", outdir, "--gtRoot", iiw_root,
                "--level", str(lvl), "--useBS"])),
            "normal_mean_deg": float(compare.main([
                "normal", "--predRoot", outdir,
                "--gtRoot", osp.join(nyu_root, "normals"),
                "--level", str(lvl)])),
            "si_log_depth_rmse": float(compare.main([
                "depth", "--predRoot", outdir,
                "--gtRoot", osp.join(nyu_root, "depths"),
                "--level", str(lvl), "--useBS"])),
        }

    t1 = time.time()
    rec = {"level": level,
           "init_products": serve("init", "init"),
           "trained_products": serve("trained", "main")}
    rec["serve_s"] = round(time.time() - t1, 1)
    rec["product_improvement"] = {
        k: round(float(rec["init_products"][k])
                 / max(float(rec["trained_products"][k]), 1e-12), 2)
        for k in rec["trained_products"]
    }
    summary["stages"]["capstone"] = rec
    log(f"[capstone] init {rec['init_products']} | trained "
        f"{rec['trained_products']} | x-better {rec['product_improvement']}"
        f" | {rec['serve_s']}s")


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
    ap.add_argument("--finetuneNYU1", action="store_true",
                    help="with --cascade1: the cascade-1 NYU fine-tune "
                         "convergence leg (trainFineTuneNYU_cascade1.py:"
                         "311-374 flow: inline Pre synthesis from the "
                         "trained c0 stacks, init = trained c1 BRDF)")
    ap.add_argument("--finetuneIIW1", action="store_true",
                    help="with --cascade1: the cascade-1 IIW fine-tune "
                         "convergence leg "
                         "(trainFineTuneIIW_cascade1.py:300-362 flow)")
    ap.add_argument("--capstone", action="store_true",
                    help="after all stages: the trained-weights product "
                         "capstone — test_real (both cascades + light + "
                         "BS) over held-out fixture photos, then the "
                         "compare CLIs on the written products, trained "
                         "vs init (runReal20.sh / testReal.py:356-540)")
    ap.add_argument("--lightB20", action="store_true",
                    help="light-stage convergence at the recommended B20 "
                         "production point with linear LR scaling, vs the "
                         "recipe's base batch (closes BASELINE.md's 'B20 "
                         "convergence parity unverified' caveat)")
    ap.add_argument("--b20Batch", type=int, default=20)
    ap.add_argument("--b20Epochs", type=int, default=None,
                    help="default: --lightEpochs (equal data passes)")
    ap.add_argument("--bsMidEpochs", type=int, default=None,
                    help="default: 3 * --bsEpochs (the mid leg is the "
                         "LEARNING gate; give it enough steps)")
    ap.add_argument("--bsMid", action="store_true",
                    help="bilateral convergence leg against a MID-training "
                         "BRDF checkpoint, where refinement signal exists "
                         "(VERDICT r4 weak #3): asserts the refined "
                         "held-out metrics beat the unrefined predictions")
    ap.add_argument("--computeDtype", default="bfloat16")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"],
                    help="force the cpu backend (the container's "
                         "sitecustomize pins the axon TPU otherwise)")
    opt = ap.parse_args(argv)

    if opt.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    # persistent XLA compile cache under the run dir: every
    # wedge-kill/resume cycle re-pays the recipe's compiles otherwise
    # (measured to work across processes over the axon tunnel; the
    # cache stores the compiled executable, not the 413-prone request)
    import jax as _jx

    os.makedirs(opt.out, exist_ok=True)
    _jx.config.update("jax_compilation_cache_dir",
                      osp.join(opt.out, "xla_cache"))
    _jx.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
        # atomic: a crash mid-serialization must never corrupt the
        # resume state (a half-written summary.json loses EVERY stage)
        blob = json.dumps({**summary, "stages": merged}, indent=1)
        tmp = sj + ".tmp"
        with open(tmp, "w") as f:
            f.write(blob)
        os.replace(tmp, sj)

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

    if opt.lightB20 and "brdf" in exp:
        # linear LR scaling rule (lr ∝ batch) from the recipe's base
        # light batch; equal epochs => equal data passes, 1/K the steps
        lr20 = 1e-4 * opt.b20Batch / max(opt.lightBatch, 1)
        b20_extra = dt + ["--brdfExperiment", exp["brdf"],
                          "--lr", f"{lr20:.6g}"]
        name0 = "light_b20"
        if name0 in prior:
            log(f"[{name0}] already recorded; skipping (resume)")
            summary["stages"][name0] = prior[name0]
        else:
            t1 = time.time()
            b20_exp = osp.join(opt.out, f"{name0}_main")
            train_light.main(args(["--experiment", b20_exp] + b20_extra,
                                  opt.b20Batch,
                                  opt.b20Epochs or opt.lightEpochs))
            rec = {"train_s": round(time.time() - t1, 1),
                   "lr": lr20, "batch": opt.b20Batch,
                   "loss": curve_stats(b20_exp)}
            m1 = test_synthetic.main(args(
                ["--stage", "light",
                 "--testRoot", osp.join(opt.out, f"test_{name0}_main"),
                 "--lightExperiment", b20_exp,
                 "--brdfExperiment", exp["brdf"]],
                opt.lightBatch, 1))
            rec["trained_test"] = {k: _scalar(m1[k])
                                   for k in ("reconst", "render")}
            base = summary["stages"].get("light") or prior.get("light")
            rec["init_test"] = (base or {}).get("trained_test", {})
            rec["vs_base_batch"] = {
                k: round(rec["init_test"].get(k, float("nan"))
                         / max(rec["trained_test"][k], 1e-12), 3)
                for k in rec["trained_test"]
            }
            summary["stages"][name0] = rec
            log(f"[{name0}] loss {rec['loss']} | B{opt.b20Batch} "
                f"lr {lr20:.2g} trained {rec['trained_test']} | base-B "
                f"trained {rec['init_test']} | b20/base "
                f"{rec['vs_base_batch']} | {rec['train_s']}s")
        dump_summary()

    if opt.bsMid and "brdf" in exp:
        import glob as _glob

        name0 = "bilateral_mid"
        if name0 in prior:
            log(f"[{name0}] already recorded; skipping (resume)")
            summary["stages"][name0] = prior[name0]
        else:
            # mid-training BRDF checkpoint: the saved epoch nearest to
            # half the run (the resumable runner keeps every
            # --saveEvery'th epoch)
            # exact brdf0_<epoch> dirs only: brdf0_step_<e>_<j>
            # preemption checkpoints would otherwise parse their step
            # index as an epoch
            import re as _re

            eps = sorted(
                int(m.group(1))
                for p in _glob.glob(osp.join(exp["brdf"], "brdf0_*"))
                for m in [_re.fullmatch(r"brdf0_(\d+)", osp.basename(p))]
                if m
            )
            assert eps, exp["brdf"]
            mid = min(eps, key=lambda e: abs(e - max(eps) / 2))
            brdf_mid = ["--brdfExperiment", exp["brdf"],
                        "--brdfEpoch", str(mid)]
            rec = {"brdf_epoch": mid}
            init_exp = osp.join(opt.out, f"{name0}_init")
            train_bilateral.main(args(
                ["--experiment", init_exp] + brdf_mid, opt.bsBatch, 1,
                max_steps=0))
            m0 = test_synthetic.main(args(
                ["--stage", "bilateral",
                 "--testRoot", osp.join(opt.out, f"test_{name0}_init"),
                 "--bsExperiment", init_exp] + brdf_mid, opt.bsBatch, 1))
            keys = ("albedo_bs", "rough_bs", "depth_bs")
            rec["init_test"] = {k: _scalar(m0[k]) for k in keys}
            t1 = time.time()
            mid_exp = osp.join(opt.out, f"{name0}_main")
            train_bilateral.main(args(
                ["--experiment", mid_exp] + brdf_mid, opt.bsBatch,
                opt.bsMidEpochs or 3 * opt.bsEpochs))
            rec["train_s"] = round(time.time() - t1, 1)
            rec["loss"] = curve_stats(mid_exp)
            m1 = test_synthetic.main(args(
                ["--stage", "bilateral",
                 "--testRoot", osp.join(opt.out, f"test_{name0}_main"),
                 "--bsExperiment", mid_exp] + brdf_mid, opt.bsBatch, 1))
            rec["trained_test"] = {k: _scalar(m1[k]) for k in keys}
            # test_synthetic's bilateral stage reports the [raw, refined]
            # pair as separate {k}_raw / {k}_bs keys: refined must BEAT
            # the frozen mid-BRDF's raw predictions
            # (trainBRDFBilateral.py:264-342)
            rec["trained_raw"] = {
                k: _scalar(m1[k.replace("_bs", "_raw")]) for k in keys
            }
            rec["test_improvement"] = {
                k: round(rec["init_test"][k]
                         / max(rec["trained_test"][k], 1e-12), 2)
                for k in keys
            }
            rec["refined_vs_raw"] = {
                k: round(rec["trained_raw"][k]
                         / max(rec["trained_test"][k], 1e-12), 3)
                for k in keys
            }
            summary["stages"][name0] = rec
            log(f"[{name0}] brdf@{mid} loss {rec['loss']} | init "
                f"{rec['init_test']} | trained {rec['trained_test']} | "
                f"raw {rec['trained_raw']} | refined/raw "
                f"{rec['refined_vs_raw']} | {rec['train_s']}s")
        dump_summary()

    if opt.finetuneNYU and "brdf" in exp:
        _finetune_nyu_leg(opt, args, exp, prior, summary)
        dump_summary()
    if opt.finetuneIIW and "brdf" in exp:
        _finetune_iiw_leg(opt, args, exp, prior, summary)
        dump_summary()
    if opt.finetuneNYU1 and "brdf1" in exp:
        _finetune_nyu_leg(opt, args, exp, prior, summary, cascade=1)
        dump_summary()
    if opt.finetuneIIW1 and "brdf1" in exp:
        _finetune_iiw_leg(opt, args, exp, prior, summary, cascade=1)
        dump_summary()
    if opt.capstone and "brdf" in exp:
        _capstone_leg(opt, exp, prior, summary)
        dump_summary()

    dump_summary()
    log("\n| stage | steps | loss first->last (ratio) | test init -> trained |")
    log("|---|---|---|---|")
    for name, rec in summary["stages"].items():
        c = rec.get("loss") or {"steps": 0, "first": float("nan"),
                                "last": float("nan"), "ratio": float("nan")}
        ik = rec.get("init_test") or rec.get("init_products") or {}
        tk = rec.get("trained_test") or rec.get("trained_products") or {}
        tt = ", ".join(
            f"{k} {ik.get(k, float('nan')):.4g}->{tk[k]:.4g}"
            for k in tk)
        log(f"| {name} | {c['steps']} | {c['first']:.4g} -> {c['last']:.4g} "
            f"({c['ratio']:.1f}x) | {tt} |")
    log(f"summary: {osp.join(opt.out, 'summary.json')}")
    return summary


if __name__ == "__main__":
    main()
