"""Shared driver plumbing for the stage CLIs.

Covers what every reference driver repeats (argparse conventions,
experiment-dir naming contracts trainBRDF.py:65-69 / trainLight.py:65-67 /
trainBRDFBilateral.py:71-75, seed pinning trainBRDF.py:71-74, checkpoint
cadence trainBRDF.py:392-396) once, plus batch staging to device.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import random

import numpy as np

import jax
import jax.numpy as jnp


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--dataRoot", help="path to the OpenRooms dataset")
    p.add_argument("--experiment", default=None, help="experiment directory")
    p.add_argument("--imHeight", type=int, default=240)
    p.add_argument("--imWidth", type=int, default=320)
    p.add_argument("--envRow", type=int, default=120)
    p.add_argument("--envCol", type=int, default=160)
    p.add_argument("--envHeight", type=int, default=8)
    p.add_argument("--envWidth", type=int, default=16)
    p.add_argument("--SGNum", type=int, default=12)
    p.add_argument("--cascadeLevel", type=int, default=0)
    p.add_argument("--batchSize", type=int, default=16)
    p.add_argument("--nepoch", type=int, default=14)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--numWorkers", type=int, default=4)
    p.add_argument("--loaderMode", default=None,
                   choices=[None, "thread", "process"],
                   help="prefetch worker kind; default: process for "
                        "BRDF-stage loaders (GIL-held PIL/numpy work), "
                        "thread for light-stage loaders (GIL-releasing "
                        "native envmap decode, large items)")
    p.add_argument("--itemCache", default=None,
                   help="directory for the packed decode cache "
                        "(data/cache.py): decode the dataset ONCE into "
                        "memmapped shards and replay epochs at page-cache "
                        "bandwidth — only the random exposure multiply "
                        "runs per item.  Unset = decode every epoch like "
                        "the reference (trainBRDF.py:136-137)")
    p.add_argument("--itemCacheHalf", action="store_true",
                   help="store the cached HDR tensors (im, env_gt) as "
                        "float16 (half the bandwidth, ~1e-3 relative "
                        "error; all other fields stay exact)")
    p.add_argument("--saveEvery", type=int, default=1, help="epochs between checkpoints")
    p.add_argument("--maxSteps", type=int, default=None,
                   help="optional cap on steps per epoch (smoke runs)")
    p.add_argument("--ckptEverySteps", type=int, default=0,
                   help="preemption-grade mid-epoch checkpoints every N "
                        "steps (0 = per-epoch only, the reference's "
                        "cadence trainBRDF.py:392-396)")
    p.add_argument("--ckptKeep", type=int, default=2,
                   help="step checkpoints retained (older ones pruned)")
    p.add_argument("--resume", default="epoch",
                   choices=["auto", "epoch", "none"],
                   help="'auto': most recent of epoch/step checkpoints "
                        "(restores mid-epoch data position + LR "
                        "schedule); 'epoch': latest epoch checkpoint; "
                        "'none': fresh start")
    p.add_argument("--logFlushSteps", type=int, default=16,
                   help="steps of metrics batched per device->host pull "
                        "(MetricLogger.log_device): the per-step lines "
                        "and .npy curves are identical, but the wire "
                        "pays ONE [N, K] transfer per N steps instead "
                        "of K blocking scalar pulls per step — on a "
                        "degraded host link a per-step pull can cost "
                        "more than the train step itself "
                        "(scripts/bench_fed_step.py).  1 = the "
                        "reference's per-iteration cadence")
    return p


def default_experiment_name(opt, kind: str, offset=None,
                            cascade=None) -> str:
    """The reference checkpoint-dir naming contract (trainBRDF.py:66,
    trainLight.py:66-67, trainBRDFBilateral.py:71-75) — the ONE place
    these format strings live; every producer and consumer resolves
    default directories through it so they cannot drift apart.

    ``cascade`` overrides opt.cascadeLevel (drivers like test_real walk
    both cascade levels with one opt)."""
    if cascade is None:
        cascade = opt.cascadeLevel
    if kind == "brdf":
        return "check_cascade%d_w%d_h%d" % (
            cascade, opt.imWidth, opt.imHeight
        )
    if kind == "light":
        off = offset if offset is not None else getattr(opt, "offset", 1.0)
        return "check_cascadeLight%d_sg%d_offset%.1f" % (
            cascade, opt.SGNum, off
        )
    if kind == "bs":
        return "checkBs_cascade%d_w%d_h%d" % (
            cascade, opt.imWidth, opt.imHeight
        )
    return "check_" + kind


def experiment_dir(opt, kind: str) -> str:
    """Reference naming contracts so stages find each other's checkpoints."""
    if opt.experiment is not None:
        exp = opt.experiment
    else:
        exp = default_experiment_name(opt, kind)
    os.makedirs(exp, exist_ok=True)
    snapshot_source(exp)
    return exp


def snapshot_source(exp_dir: str):
    """Reproducibility pinning: copy the package source into the
    experiment dir (the reference's ``cp *.py`` — trainBRDF.py:68-69)."""
    import shutil

    pkg_root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    dst = osp.join(exp_dir, "src_snapshot")
    if osp.isdir(dst):
        return
    shutil.copytree(
        pkg_root, osp.join(dst, osp.basename(pkg_root)),
        ignore=shutil.ignore_patterns("__pycache__"),
    )


def enable_compile_cache(path: str = "~/.cache/irois_xla_cache"):
    """Persistent XLA compilation cache: the full-resolution graphs take
    minutes to compile, so every driver caches them across runs.

    Skipped on the axon tunnel backend: there a cache HIT is ~5x slower
    than a fresh compile (loading a deserialized executable recompiles
    server-side without the compile service's fast path — measured 490 s
    vs 7-105 s on the fused SG kernel)."""
    try:
        # default_backend() reports "tpu" even on the tunnel, so the
        # guard must key on the PLATFORM REGISTRATION (the env var
        # and/or the jax_platforms config the axon sitecustomize sets)
        platforms = " ".join(
            str(x)
            for x in (os.environ.get("JAX_PLATFORMS", ""),
                      getattr(jax.config, "jax_platforms", "") or "")
        ).lower()
        if "axon" in platforms:
            return
        jax.config.update(
            "jax_compilation_cache_dir", osp.expanduser(path)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # pragma: no cover - older jax
        print(f"compilation cache unavailable: {e}")


def pin_seeds(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    enable_compile_cache()
    return jax.random.PRNGKey(seed)


def stage_batch(batch: dict, drop=("name",)):
    """numpy batch dict -> device jnp arrays (the .cuda() staging loop
    equivalent, e.g. trainBRDF.py:149-174 — one device_put, no per-tensor
    copies)."""
    out = {}
    for k, v in batch.items():
        if k in drop:
            continue
        out[k] = jnp.asarray(v)
    return out


def make_loader(opt, phase: str, is_light: bool, shuffle=True):
    from inverserenderingofindoorscene_tpu.data.openrooms import (
        BatchIterator,
        OpenRoomsDataset,
    )

    ds = OpenRoomsDataset(
        opt.dataRoot,
        im_hw=(opt.imHeight, opt.imWidth),
        phase=phase,
        cascade_level=opt.cascadeLevel,
        is_light=is_light,
        is_all_light=is_light,
        env_hw=(opt.envHeight, opt.envWidth),
        env_rc=(opt.envRow, opt.envCol),
        sg_num=opt.SGNum,
        seed=opt.seed,
    )
    if getattr(opt, "itemCache", None):
        from inverserenderingofindoorscene_tpu.data.cache import (
            CachedOpenRoomsDataset,
        )

        ds = CachedOpenRoomsDataset(
            ds, opt.itemCache, workers=max(opt.numWorkers, 1),
            half=getattr(opt, "itemCacheHalf", False),
        )
    # Prefetch mode (scripts/bench_loader.py medians, 4-core host):
    # BRDF items are dominated by GIL-held PIL/numpy work -> process
    # workers win (80 vs 57 items/s); light items are dominated by the
    # GIL-RELEASING native envmap decode, and their 22 MB env_gt loses
    # more to per-item IPC than the GIL costs -> threads win (13 vs 4).
    # Cached items are memmap slices: always threads (IPC would re-copy).
    mode = getattr(opt, "loaderMode", None) or (
        "thread" if (is_light or getattr(opt, "itemCache", None))
        else "process"
    )
    if opt.numWorkers <= 1:
        mode = "thread"
    return BatchIterator(
        ds, opt.batchSize, shuffle=shuffle, num_workers=opt.numWorkers,
        seed=opt.seed, mode=mode,
    )


def zip_max_cycle(loader_a, loader_b):
    """Pair batches with epoch length = max(len) and the shorter loader
    wrapping — the reference ConcatDataset semantics
    (iiwDataLoader.py:14-22). Plain zip() would truncate the epoch to the
    small real-data set."""
    import itertools

    n = max(len(loader_a), len(loader_b))

    def cyc(ld):
        while True:
            yield from ld

    return itertools.islice(zip(cyc(loader_a), cyc(loader_b)), n), n


def load_frozen_cascade0(opt, rng):
    """Frozen cascade-0 BRDF+Light stacks (for cascade-1 fine-tuning's
    inline Pre synthesis, trainFineTuneIIW_cascade1.py:300-362)."""
    import copy

    import jax as _jax

    from inverserenderingofindoorscene_tpu.cli.output_brdf_light import (
        load_frozen_light,
    )
    from inverserenderingofindoorscene_tpu.cli.train_light import (
        load_frozen_brdf,
    )
    from inverserenderingofindoorscene_tpu.pipeline.light import LightNets

    opt0 = copy.copy(opt)
    opt0.cascadeLevel = 0
    if not hasattr(opt0, "offset"):
        opt0.offset = 1.0
    if not hasattr(opt0, "lightExperiment"):
        opt0.lightExperiment = None
    if not hasattr(opt0, "lightEpoch"):
        opt0.lightEpoch = None
    # At cascade 1 ``--brdfExperiment`` names the CASCADE-1 init point;
    # the frozen synthesis stack comes from the separate
    # ``--brdf0Experiment`` / ``--light0Experiment`` (the reference loads
    # the two levels from distinct check_cascade{0,1} dirs,
    # trainFineTuneIIW_cascade1.py:117-160)
    if getattr(opt, "brdf0Experiment", None):
        opt0.brdfExperiment = opt.brdf0Experiment
        opt0.brdfEpoch = getattr(opt, "brdf0Epoch", None)
    if getattr(opt, "light0Experiment", None):
        opt0.lightExperiment = opt.light0Experiment
        opt0.lightEpoch = getattr(opt, "light0Epoch", None)
    # Hard-fail when the cascade-0 checkpoints cannot be found: a typo'd
    # or omitted --brdf0Experiment/--light0Experiment would otherwise
    # fall through to the loaders' random-frozen-nets WARNING and the
    # whole fine-tune would train against garbage pre-conditioning
    # "successfully" (the reference crashes on a missing checkpoint,
    # trainFineTuneIIW_cascade1.py:117-160)
    from inverserenderingofindoorscene_tpu.utils import checkpoint as _ck

    bexp = opt0.brdfExperiment or default_experiment_name(opt0, "brdf")
    if (opt0.brdfEpoch is None
            and _ck.latest_epoch(bexp, "brdf", 0) is None):
        raise FileNotFoundError(
            f"cascade-1 pre-synthesis needs a trained cascade-0 BRDF; no "
            f"checkpoint under {bexp!r} (--brdf0Experiment/--brdf0Epoch)")
    lexp = opt0.lightExperiment or default_experiment_name(
        opt0, "light", offset=getattr(opt0, "offset", 1.0))
    if (opt0.lightEpoch is None
            and _ck.latest_epoch(lexp, "light", 0) is None):
        raise FileNotFoundError(
            f"cascade-1 pre-synthesis needs a trained cascade-0 Light "
            f"stack; no checkpoint under {lexp!r} "
            f"(--light0Experiment/--light0Epoch)")
    k1, k2 = _jax.random.split(rng)
    brdf_nets0, brdf_params0 = load_frozen_brdf(opt0, k1)
    light_nets0 = LightNets(
        sg_num=opt.SGNum, cascade_level=0,
        env_rows=opt.envRow, env_cols=opt.envCol,
        env_height=opt.envHeight, env_width=opt.envWidth,
    )
    light_params0 = load_frozen_light(opt0, k2, light_nets0)
    # Commit the frozen stacks to the device: orbax restores host targets
    # as numpy, and a jit that CLOSES OVER numpy leaves (the inline
    # synthesize_pre wrappers here and in scripts/run_convergence.py)
    # embeds them as HLO constants — tens of MB re-uploaded inside every
    # compiled program, which stalls the axon tunnel.  As committed
    # jax.Arrays they upload once and the programs reference them.
    brdf_params0 = _jax.device_put(brdf_params0)
    light_params0 = _jax.device_put(light_params0)
    return brdf_nets0, light_nets0, brdf_params0, light_params0


def make_pre_synth(opt, rng):
    """Jitted ``*_pre`` synthesizer over the frozen cascade-0 stack for
    the cascade-1 fine-tune flows (trainFineTune*_cascade1.py:300-374).

    The frozen params enter the jit as ARGUMENTS, never as closures:
    closed-over weights (numpy or jax.Array alike) lower to HLO
    constants, and the c0 BRDF+Light stack is ~400 MB of conv kernels —
    a compile request that big is rejected by the axon tunnel's
    /remote_compile endpoint (HTTP 413, surfacing as a stalled ~4 MB
    socket Send-Q mid-upload)."""
    import jax as _jax

    from inverserenderingofindoorscene_tpu.pipeline.finetune import (
        synthesize_pre,
    )

    bn0, ln0, bp0, lp0 = load_frozen_cascade0(opt, rng)
    syn = _jax.jit(lambda bp, lp, b: synthesize_pre(bn0, ln0, bp, lp, b))
    return lambda b: syn(bp0, lp0, b)


def dump_preview(exp, epoch, step, arrays: dict):
    """Periodic PNG dumps (trainBRDF.py:334-369 cadence is the caller's).

    4-D arrays are written as whole-batch grids, matching the reference's
    ``vutils.save_image`` batch previews."""
    from inverserenderingofindoorscene_tpu.utils.io import (
        write_image,
        write_image_grid,
    )

    for name, (img, gamma) in arrays.items():
        img = np.asarray(jax.device_get(img))
        path = osp.join(exp, f"{name}_{epoch}_{step}.png")
        if img.ndim == 4:
            write_image_grid(img, path, gamma=gamma)
        else:
            write_image(img, path, gamma=gamma)


def resume_train_state(opt, exp, stage, cascade, state,
                       explicit_epoch=None):
    """Unified resume for the train CLIs -> (state, start_epoch, skip).

    ``--resume epoch`` (default): latest per-epoch checkpoint (or the
    explicit ``--resumeEpoch``), continuing at the next epoch — the
    reference's resume granularity (trainBRDF.py:90-103).
    ``--resume auto``: the most RECENT of the epoch and per-step
    checkpoints; a step checkpoint restores mid-epoch, continuing at
    batch ``skip`` of ``start_epoch`` — the LR schedule rides in the
    restored opt_state/step, and the loaders' (seed, epoch, item)-keyed
    augmentation streams make the skipped prefix deterministic.
    ``--resume none``: fresh start.
    """
    from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt

    mode = getattr(opt, "resume", "epoch")
    if mode == "none":
        return state, 0, 0
    ep = explicit_epoch
    if ep is None:
        ep = ckpt.latest_epoch(exp, stage, cascade)
    best = None if ep is None else ("epoch", ep)
    if mode == "auto" and explicit_epoch is None:
        steps = ckpt.list_step_checkpoints(exp, stage, cascade)
        if steps:
            e2, j2 = steps[-1]
            # an epoch-e checkpoint resumes at position (e+1, 0); a step
            # checkpoint after step j of epoch e resumes at (e, j+1)
            if ep is None or (e2, j2 + 1) > (ep + 1, 0):
                best = ("step", (e2, j2))
    if best is None:
        return state, 0, 0
    if best[0] == "epoch":
        state = ckpt.restore_checkpoint(exp, stage, cascade, best[1], state)
        print(f"resumed from epoch {best[1]}")
        return state, best[1] + 1, 0
    e2, j2 = best[1]
    state, _, _ = ckpt.restore_step_checkpoint(
        exp, stage, cascade, e2, j2, state
    )
    print(f"resumed from step checkpoint epoch {e2} step {j2}")
    return state, e2, j2 + 1


def maybe_save_step_checkpoint(opt, exp, stage, cascade, state, epoch, j,
                               logger=None):
    """The per-N-step save hook (no-op unless --ckptEverySteps > 0).

    Flushes the (possibly buffered, --logFlushSteps) MetricLogger before
    writing, so a kill right after the save never loses log lines for
    steps the checkpoint already covers — resume skips those steps
    without re-logging them, which would leave a permanent gap in
    trainingLog.txt and the error curves."""
    from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt

    n = getattr(opt, "ckptEverySteps", 0) or 0
    if n > 0 and (j + 1) % n == 0:
        if logger is not None:
            logger.flush()
        ckpt.save_step_checkpoint(
            exp, stage, cascade, state, epoch, j,
            keep=getattr(opt, "ckptKeep", 2),
        )
