"""End-to-end FED train-step throughput on the real chip (r4).

BASELINE.md's cache section proves the loader side (items/s >= need);
this measures the whole thing actually running together: real train
steps on the chip consuming batches from the cached loader, wall-clock
ms/step over an epoch, against the chip-only step time (same jit
program, one staged batch re-fed).  Feeding efficiency = chip_only/fed.

Also A/Bs the metric-logging pull policy: per-step per-metric
``float()`` (the reference's per-iteration cadence,
trainBRDF.py:297-331) pays len(metrics) blocking D2H pulls per step —
catastrophic when the host link degrades (~0.3 s/pull windows observed
on this tunnel); the CLIs' MetricLogger.log_device default stacks each
step's metrics into one device vector and pulls ONE [N, K] array per
--flushEvery steps, with identical logged content.

Usage: python scripts/bench_fed_step.py [--stage brdf light] \
    [--rounds 3] [--root /tmp/irois_loader_bench] [--images 48]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from bench_loader import ENV_RC, IM_HW, generate, log  # noqa: E402


def _setup(stage, root, cache_dir, workers):
    import jax

    from inverserenderingofindoorscene_tpu.data.cache import (
        CachedOpenRoomsDataset,
    )
    from inverserenderingofindoorscene_tpu.data.openrooms import (
        BatchIterator,
        OpenRoomsDataset,
    )
    from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
    from inverserenderingofindoorscene_tpu.train.steps import (
        create_train_state,
        make_brdf_train_step,
        make_light_train_step,
        reference_adam,
    )

    is_light = stage == "light"
    batch = 5 if is_light else 16
    ds = OpenRoomsDataset(root, im_hw=IM_HW, env_rc=ENV_RC,
                          is_light=is_light, is_all_light=is_light)
    ds = CachedOpenRoomsDataset(ds, cache_dir, workers=4)
    it = BatchIterator(ds, batch, num_workers=workers, seed=1, mode="thread")

    brdf_nets = BRDFNets(cascade_level=0, compute_dtype="bfloat16")
    bp = brdf_nets.init(jax.random.PRNGKey(0), IM_HW)
    if is_light:
        from inverserenderingofindoorscene_tpu.pipeline.light import (
            LightNets,
        )

        light_nets = LightNets(cascade_level=0, env_rows=ENV_RC[0],
                               env_cols=ENV_RC[1],
                               compute_dtype="bfloat16")
        lp = light_nets.init(jax.random.PRNGKey(1))
        step_fn = jax.jit(
            make_light_train_step(brdf_nets, light_nets, bp,
                                  use_pallas=True),
            donate_argnums=(0,),
        )
        state = create_train_state(lp, reference_adam(1e-4))
    else:
        step_fn = jax.jit(make_brdf_train_step(brdf_nets),
                          donate_argnums=(0,))
        state = create_train_state(bp, reference_adam(1e-4))
    return it, step_fn, state


def main():
    import jax

    from inverserenderingofindoorscene_tpu.cli.common import stage_batch

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/irois_loader_bench")
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--flushEvery", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--stage", nargs="+", default=["brdf", "light"])
    opt = ap.parse_args()

    generate(opt.root, opt.images)

    # tunnel health: per-dispatch latency of a trivial jit program.  The
    # axon tunnel drifts (~1 ms healthy, ~16 ms degraded — BASELINE.md);
    # all phases below run interleaved in THIS process so a drift mid-run
    # shows up as round-to-round spread, not a silent bias.
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    x = tiny(jnp.zeros(8))
    t0 = time.perf_counter()
    for _ in range(20):
        x = tiny(x)
    jax.block_until_ready(x)
    disp_ms = (time.perf_counter() - t0) / 20 * 1e3
    # D2H scalar-pull latency: the cost of ONE float(metric).  Observed
    # 1-2 ms healthy and ~300 ms in degraded tunnel windows — the
    # degraded state is what makes per-step metric pulls dominate.
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(x[0])
    pull_ms = (time.perf_counter() - t0) / 5 * 1e3
    log(f"dispatch latency {disp_ms:.2f} ms | D2H scalar pull "
        f"{pull_ms:.2f} ms"
        + (" (DEGRADED tunnel — fed numbers are upper bounds)"
           if disp_ms > 5 or pull_ms > 20 else ""))

    results = {}
    for stage in opt.stage:
        it, step_fn, state = _setup(stage, opt.root,
                                    osp.join(opt.root, "cache"), opt.workers)

        # warmup epoch: compiles the step, faults the cache pages, and
        # leaves NO live partially-consumed iterator behind (a second
        # concurrent iterator would contend on the loader's buffer pool)
        b_rep = None
        for np_batch in it:
            b_rep = stage_batch(np_batch)
            state, metrics = step_fn(state, b_rep)
        jax.block_until_ready(metrics)

        def chip_only(k=10):
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(k):
                state, m = step_fn(state, b_rep)
            jax.block_until_ready(m)
            return (time.perf_counter() - t0) / k * 1e3

        def fed(sync):
            """One fed epoch.  sync=True: per-metric float() pulls every
            step (the CLIs' pre-r4 behavior, --logFlushSteps 1 cadence);
            sync=False: the buffered MetricLogger.log_device policy now
            default in the train CLIs (one stacked pull per flushEvery)."""
            from inverserenderingofindoorscene_tpu.utils.logging import (
                MetricLogger,
            )

            nonlocal state
            logger = MetricLogger(flush_steps=opt.flushEvery)
            logger.log = lambda e, s, m: logger.append(m)  # no printing
            n = 0
            t0 = time.perf_counter()
            for np_batch in it:  # one full epoch from the cached loader
                b = stage_batch(np_batch)
                state, metrics = step_fn(state, b)
                if sync is True:
                    _ = {k: float(v) for k, v in metrics.items()}
                elif sync is False:
                    logger.log_device(0, n, metrics)
                # sync=None: no logging at all — the pure fed floor
                n += 1
            logger.flush()
            jax.block_until_ready(metrics)
            return (time.perf_counter() - t0) / n * 1e3

        # interleaved rounds (same-hour A/B rule): chip floor and both
        # fed policies sampled alternately; report medians
        chips, floors, syncs, defers = [], [], [], []
        for _ in range(opt.rounds):
            chips.append(chip_only())
            floors.append(fed(sync=None))
            syncs.append(fed(sync=True))
            defers.append(fed(sync=False))
        it.close()

        def med(v):
            return sorted(v)[len(v) // 2]

        chip_ms, fed_sync, fed_defer = med(chips), med(syncs), med(defers)
        fed_floor = med(floors)
        results[stage] = {
            "dispatch_ms": round(disp_ms, 2),
            "d2h_pull_ms": round(pull_ms, 2),
            "chip_only_ms": round(chip_ms, 2),
            "fed_nolog_ms": round(fed_floor, 2),
            "fed_sync_ms": round(fed_sync, 2),
            "fed_buffered_ms": round(fed_defer, 2),
            "efficiency_nolog": round(chip_ms / fed_floor, 3),
            "efficiency_sync": round(chip_ms / fed_sync, 3),
            "efficiency_buffered": round(chip_ms / fed_defer, 3),
            "rounds": {"chip": [round(v, 1) for v in chips],
                       "nolog": [round(v, 1) for v in floors],
                       "sync": [round(v, 1) for v in syncs],
                       "defer": [round(v, 1) for v in defers]},
        }
        log(f"[{stage}] chip-only {chip_ms:.1f} ms/step | fed no-log "
            f"{fed_floor:.1f} | fed per-step-sync {fed_sync:.1f} | "
            f"fed buffered-log {fed_defer:.1f} | efficiency "
            f"{results[stage]['efficiency_nolog']:.0%} / "
            f"{results[stage]['efficiency_sync']:.0%} / "
            f"{results[stage]['efficiency_buffered']:.0%}")
    print(results)


if __name__ == "__main__":
    main()
