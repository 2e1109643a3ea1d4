"""End-to-end FED train-step throughput on the real chip (r4).

BASELINE.md's cache section proves the loader side (items/s >= need);
this measures the whole thing actually running together: real train
steps on the chip consuming batches from the cached loader, wall-clock
ms/step over an epoch, against the chip-only step time (same jit
program, one staged batch re-fed).  Feeding efficiency = chip_only/fed.

Also A/Bs the metric-logging sync policy: the train CLIs' per-step
``float(metrics)`` blocks the host until the step finishes, which
serializes dispatch on this tunnel (~1-16 ms/dispatch); `deferred` keeps
metrics as device scalars and converts every --flushEvery steps, letting
JAX's async dispatch pipeline steps (the reference prints per-iteration
too, trainBRDF.py:297-331 — parity is a flush policy, not a loss of
logging).

Usage: python scripts/bench_fed_step.py [--stage brdf light] \
    [--steps 40] [--root /tmp/irois_loader_bench] [--images 48]
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
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--flushEvery", type=int, default=20)
    ap.add_argument("--stage", nargs="+", default=["brdf", "light"])
    opt = ap.parse_args()

    generate(opt.root, opt.images)
    results = {}
    for stage in opt.stage:
        it, step_fn, state = _setup(stage, opt.root,
                                    osp.join(opt.root, "cache"), opt.workers)

        # warmup: compile + first batches
        batches = iter(it)
        b = stage_batch(next(batches))
        for _ in range(3):
            state, metrics = step_fn(state, b)
        jax.block_until_ready(metrics)

        # chip-only floor: same staged batch re-fed, no logging sync
        t0 = time.perf_counter()
        for _ in range(opt.steps):
            state, metrics = step_fn(state, b)
        jax.block_until_ready(metrics)
        chip_ms = (time.perf_counter() - t0) / opt.steps * 1e3

        def run(sync, steps=opt.steps):
            nonlocal state
            n = 0
            pend = []
            metrics = None
            t0 = time.perf_counter()
            while n < steps:  # epochs of the fed stream until enough steps
                for np_batch in it:
                    b = stage_batch(np_batch)
                    state, metrics = step_fn(state, b)
                    if sync:
                        _ = {k: float(v) for k, v in metrics.items()}
                    else:
                        pend.append(metrics)
                        if len(pend) >= opt.flushEvery:
                            _ = jax.device_get(pend)
                            pend = []
                    n += 1
                    if n >= steps:
                        break
            _ = jax.device_get(pend)
            jax.block_until_ready(metrics)
            return (time.perf_counter() - t0) / n * 1e3

        fed_sync = run(sync=True)
        fed_defer = run(sync=False)
        it.close()
        results[stage] = {
            "chip_only_ms": round(chip_ms, 2),
            "fed_sync_ms": round(fed_sync, 2),
            "fed_deferred_ms": round(fed_defer, 2),
            "efficiency_sync": round(chip_ms / fed_sync, 3),
            "efficiency_deferred": round(chip_ms / fed_defer, 3),
        }
        log(f"[{stage}] chip-only {chip_ms:.1f} ms/step | fed(sync-log) "
            f"{fed_sync:.1f} | fed(deferred-log) {fed_defer:.1f} | "
            f"efficiency {results[stage]['efficiency_sync']:.0%} / "
            f"{results[stage]['efficiency_deferred']:.0%}")
    print(results)


if __name__ == "__main__":
    main()
