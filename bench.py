"""Benchmark: fused SG-shading fwd+bwd throughput on one TPU chip.

Prints ONE JSON line (the LAST line of stdout is always the most complete):
  value        = Mpixels/s/chip for the fused Pallas forward+backward at the
                 reference lighting operating point (batch 4, 120x160 grid,
                 12 SG lobes, 8x16 envmap, grads into albedo/normal/rough/
                 axis/lambda/weight; /root/reference/models.py:348-522).
  vs_baseline  = speedup over the best XLA-compiled pure-jnp implementation
                 of the same computation on the same chip (the reference
                 repo publishes no numbers — SURVEY.md §6 — so the baseline
                 is the unfused XLA path, i.e. what a straight port would
                 run).

Execution is STAGED under an explicit wall-clock budget (round 1 lesson:
the driver timed the whole thing out before anything printed):

  1. compile + time the fused kernel, EMIT a JSON line immediately
     (vs_baseline: null);
  2. correctness gate: the Mosaic-compiled kernel vs a float64 CPU anchor
     at a small shape (fwd <=5e-3, grads <=2e-2 relative; measured honest
     f32 rounding on-chip is fwd ~2e-3 / grads ~7e-3 worst-case, so the
     gate trips on real numerics regressions, which land >=1e-1, without
     flaking on rounding) — this doubles as the standing real-TPU kernel
     check.  The anchor is f64, NOT the f32 jnp path: measured on-chip,
     the fused kernel is up to 300x CLOSER to f64 truth than the unfused
     jnp baseline (axis grads 1.4e-4 vs 4.9e-2 rel — the jnp path's huge
     f32 reduction chains lose precision), so gating kernel-vs-jnp tightly
     would test the baseline's rounding, not the kernel's correctness.
     A loose 5e-2 kernel-vs-jnp cross-check still runs at the FULL shape;
  3. time the jnp baseline, EMIT the enriched line with vs_baseline;
  4. extras if budget remains: fwd-only timing, a second gate shape, and
     the on-device bilateral solve (fwd+bwd ms per 120x160 image).

Every stage checks the deadline first; a driver kill at any point after
stage 1 still leaves a parseable JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

T0 = time.time()
# 540 of the driver's 590 s timeout: normal runs finish in 150-270 s,
# but a degraded-tunnel window (slow compiles + the 45 s backoff
# re-measures) needs the headroom — at 300 s such a window exhausted the
# budget before the correctness gates ran (2026-08-20).
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "540"))


def remaining() -> float:
    return BUDGET_S - (time.time() - T0)


def log(msg: str) -> None:
    print(f"[{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


import threading  # noqa: E402

# ---- stage 0: backend watchdog (NO jax-touching imports above this) -----
# The axon tunnel can be DOWN (observed 2026-08-18: PJRT client creation
# blocks forever while the loopback relay still accepts connections), and
# `jax.experimental.pallas.tpu`'s IMPORT already initializes the backend.
# Without this watchdog an outage at driver time would time the run out
# with NO output — the round-1 failure mode. It emits a parseable
# null-value JSON line and exits if the backend doesn't come up in time.
_WATCHDOG_S = float(os.environ.get("BENCH_BACKEND_WATCHDOG_S", "150"))


def _backend_timeout():
    print(
        json.dumps({
            "metric": "sg_shading_fwd_bwd_throughput",
            "value": None,
            "unit": "Mpixels/s/chip",
            "vs_baseline": None,
            "extra": {"error": (
                f"TPU backend init exceeded {_WATCHDOG_S:.0f}s "
                "(axon tunnel outage?)"
            )},
        }),
        flush=True,
    )
    log("backend init watchdog fired — tunnel down? emitting null result")
    os._exit(0)


_watchdog = threading.Timer(_WATCHDOG_S, _backend_timeout)
_watchdog.daemon = True
_watchdog.start()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# NO persistent compile cache here: on the axon tunnel backend a cache HIT
# is ~5x SLOWER than a fresh compile (measured 490s deserialize/load vs
# 7-105s compile — loading a deserialized executable appears to recompile
# server-side without the compile service's fast path). Round-1's timeout
# was exactly this stall. Fresh-compiling every run keeps worst-observed
# time-to-first-JSON around two minutes.

from inverserenderingofindoorscene_tpu.core import brdf, sg  # noqa: E402
from inverserenderingofindoorscene_tpu.ops.sg_render import render_sg  # noqa: E402

jax.devices()  # force backend init under the watchdog
_watchdog.cancel()
log("backend up")

B, H, W, K = 4, 120, 160, 12


def make_inputs(b=B, h=H, w=W, k=K, seed=0):
    rng = np.random.RandomState(seed)
    albedo = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    normal = rng.uniform(-1, 1, (b, h, w, 3))
    normal[..., 2] = np.abs(normal[..., 2]) + 0.3
    normal = jnp.asarray(
        0.97 * normal / np.linalg.norm(normal, axis=-1, keepdims=True),
        jnp.float32,
    )
    rough = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 1)), jnp.float32)
    ax = rng.uniform(-1, 1, (b, h, w, k, 3))
    ax = jnp.asarray(ax / np.linalg.norm(ax, axis=-1, keepdims=True), jnp.float32)
    lamb = jnp.asarray(rng.uniform(0, 20, (b, h, w, k)), jnp.float32)
    wgt = jnp.asarray(rng.uniform(0, 2, (b, h, w, k, 3)), jnp.float32)
    return albedo, normal, rough, ax, lamb, wgt


def fwd_bwd(render_fn):
    def loss(*a):
        d, s = render_fn(*a)
        return jnp.sum(d * 1.3 + s * 0.7)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))


def fence(out):
    """HARD host-transfer sync: block_until_ready can return before
    execution completes on the experimental tunnel backend; fetching one
    output to host is the only reliable fence."""
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def timeit(fn, args, target_s=3.0, max_iters=50, rounds=3):
    """Amortized per-call time; iteration count adapts to the budget.

    Takes the MIN of ``rounds`` amortized measurements: the tunnel/host
    load varies minute-to-minute (observed ±20% on identical code), and
    the minimum is the least-noise latency estimator."""
    fence(fn(*args))  # warmup (compile happened on the first call)
    t0 = time.perf_counter()
    fence(fn(*args))
    dt1 = time.perf_counter() - t0
    iters = int(max(5, min(max_iters, target_s / max(dt1, 1e-6))))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / iters)
        if remaining() < 30:
            break
    return best, iters


RESULT = {
    "metric": "sg_shading_fwd_bwd_throughput",
    "value": None,
    "unit": "Mpixels/s/chip",
    "vs_baseline": None,
}


def emit():
    print(json.dumps(RESULT), flush=True)


def gate_grads(ref, got, tol, label="", names=None):
    """Max relative grad error across the inputs (normalized per-tensor,
    against the max-abs of the reference tensor)."""
    worst, ok = 0.0, True
    if names is None:
        names = ["albedo", "normal", "rough", "axis", "lamb", "weight"]
    for name, a, b in zip(names, ref, got):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(float(np.abs(a).max()), 1.0)
        err = float(np.abs(a - b).max()) / scale
        worst = max(worst, err)
        if err > tol:
            log(f"GRAD MISMATCH{label} {name}: rel {err:.2e} > {tol}")
            ok = False
    return ok, worst


def jnp_path(a, n, r, x, lm, w):
    return brdf.render_envmap(a, n, r, sg.sg_to_envmap(x, lm, w))


def f64_anchor_gate(shape, seed, grad_tol=2e-2, fwd_tol=5e-3):
    """Standing real-TPU kernel check: Mosaic-compiled fwd+grads vs the
    float64 jnp anchor on CPU, at a small shape (f64 at the full shape
    would materialize the [B,H,W,K,8,16,3] intermediate ~28 GB on host)."""
    b, h, w = shape
    args = make_inputs(b=b, h=h, w=w, seed=seed)
    gp = jax.device_get(fwd_bwd(render_sg)(*args))
    fp = jax.device_get(jax.jit(render_sg)(*args))

    cpu = jax.devices("cpu")[0]
    # enable_x64 is scoped: enabling it globally changes integer/iota
    # dtypes inside the Mosaic kernels and breaks their compile, so only
    # the CPU anchor runs under it.
    with jax.enable_x64(True), jax.default_device(cpu):
        args64 = [jnp.asarray(np.asarray(a), jnp.float64) for a in args]

        def loss64(*a):
            d, s = jnp_path(*a)
            return jnp.sum(d * 1.3 + s * 0.7)

        g64 = jax.device_get(jax.grad(loss64, argnums=tuple(range(6)))(*args64))
        f64 = jax.device_get(jnp_path(*args64))

    ok, worst = gate_grads(g64, gp, grad_tol, label=f" {shape}")
    fwd_err = max(
        float(np.abs(np.asarray(fp[i], np.float64) - f64[i]).max())
        / max(float(np.abs(f64[i]).max()), 1.0)
        for i in range(2)
    )
    ok = ok and fwd_err <= fwd_tol
    return ok, worst, fwd_err


def main():
    extra = {}
    RESULT["extra"] = extra

    # ---- stage 1: fused kernel, emit immediately --------------------------
    args = make_inputs()
    g_pal = fwd_bwd(render_sg)
    log("compiling fused fwd+bwd ...")
    gp = g_pal(*args)
    fence(gp)
    log("compiled; timing fused kernel")
    dt_pal, it = timeit(g_pal, args, target_s=min(3.0, remaining() / 4))
    pix = B * H * W
    RESULT["value"] = round(pix / dt_pal / 1e6, 2)
    extra["fused_ms"] = round(dt_pal * 1e3, 3)
    extra["timing_iters"] = it
    log(f"fused fwd+bwd {dt_pal*1e3:.3f} ms ({it} iters)")
    emit()

    # Degraded-tunnel guard: the axon backend has an observed pathological
    # state that adds ~16 ms to EVERY executable dispatch for tens of
    # minutes (2026-08-20: fused 35.3 ms vs the normal 2.8, jnp baseline
    # inflated identically, correctness gates unaffected). A measurement
    # >3x the historical envelope is that state, not this kernel — back
    # off and re-measure while budget allows, keep the best, and record
    # the rejected readings.
    DEGRADED_MS = 10.0
    rejects = []
    while extra["fused_ms"] > DEGRADED_MS and remaining() > 150:
        rejects.append(extra["fused_ms"])
        log(f"degraded-backend reading ({extra['fused_ms']} ms > "
            f"{DEGRADED_MS}); backing off 45 s and re-measuring "
            f"({remaining():.0f}s budget left)")
        time.sleep(45.0)
        dt2, it2 = timeit(g_pal, args, target_s=min(3.0, remaining() / 4))
        if dt2 < dt_pal:
            dt_pal, it = dt2, it2
            RESULT["value"] = round(pix / dt_pal / 1e6, 2)
            extra["fused_ms"] = round(dt_pal * 1e3, 3)
            extra["timing_iters"] = it
        if len(rejects) >= 3:
            break
    if rejects:
        extra["degraded_rejects_ms"] = rejects
        log(f"fused fwd+bwd after backoff {dt_pal*1e3:.3f} ms")
        emit()

    # ---- stage 2: correctness gate (the standing real-TPU kernel check) ---
    if remaining() < 60:
        log(f"budget ({remaining():.0f}s left): skipping gate + baseline")
        return
    log("gate: Mosaic kernel vs f64 CPU anchor (small shape) ...")
    ok, worst, fwd_err = f64_anchor_gate((1, 24, 32), seed=0)
    extra["gate"] = "pass" if ok else "FAIL"
    extra["gate_grad_rel_vs_f64"] = float(f"{worst:.3e}")
    extra["gate_fwd_rel_vs_f64"] = float(f"{fwd_err:.3e}")
    log(f"gate {'pass' if ok else 'FAIL'}: fwd rel {fwd_err:.2e}, "
        f"grad rel {worst:.2e} (vs f64)")
    if not ok:
        RESULT["metric"] = "sg_shading_fwd_bwd_throughput_GRAD_MISMATCH"
    emit()

    # loose cross-check vs the f32 jnp path at the FULL shape (the jnp
    # path itself is only ~5e-2-accurate on chip, so 5e-2 is its rounding)
    log("compiling jnp baseline fwd+bwd ...")
    g_jnp = fwd_bwd(jnp_path)
    gj = g_jnp(*args)
    fence(gj)
    xok, xworst = gate_grads(jax.device_get(gj), jax.device_get(gp), 5e-2)
    extra["xcheck_full_shape_rel"] = float(f"{xworst:.3e}")
    if not xok:
        RESULT["metric"] = "sg_shading_fwd_bwd_throughput_GRAD_MISMATCH"
        extra["gate"] = "FAIL"
    emit()

    # ---- stage 3: baseline timing -> vs_baseline --------------------------
    if remaining() < 20:
        log("budget: skipping baseline timing")
        return
    dt_jnp, itj = timeit(g_jnp, args, target_s=min(3.0, remaining() / 3))
    RESULT["vs_baseline"] = round(dt_jnp / dt_pal, 3)
    extra["jnp_ms"] = round(dt_jnp * 1e3, 3)
    log(f"jnp fwd+bwd {dt_jnp*1e3:.3f} ms ({itj} iters) -> "
        f"{RESULT['vs_baseline']}x")
    emit()

    # ---- stage 4: extras, cheapest first -----------------------------------
    if remaining() > 30:
        f_pal = jax.jit(render_sg)
        fence(f_pal(*args))
        dt_fwd, _ = timeit(f_pal, args, target_s=2.0)
        extra["fwd_only_ms"] = round(dt_fwd * 1e3, 3)
        log(f"fused fwd-only {dt_fwd*1e3:.3f} ms")
        emit()

    if remaining() > 45:
        # second gate shape (odd-ish dims) for the standing kernel check
        ok2, worst2, fwd2 = f64_anchor_gate((2, 36, 48), seed=3)
        extra["gate2"] = "pass" if ok2 else "FAIL"
        extra["gate2_grad_rel_vs_f64"] = float(f"{worst2:.3e}")
        log(f"gate shape2 {'pass' if ok2 else 'FAIL'} "
            f"(fwd {fwd2:.2e}, grad {worst2:.2e} vs f64)")
        if not ok2:
            RESULT["metric"] = "sg_shading_fwd_bwd_throughput_GRAD_MISMATCH"
        emit()

    if remaining() > 45:
        # standing real-TPU check for the OTHER Pallas kernel: the fused
        # SG->envmap decode (reconstruction-loss path, models.py:371-389)
        # vs its f64 CPU anchor, fwd + grads, small shape
        from inverserenderingofindoorscene_tpu.ops.sg_render import sg_envmap

        _, _, _, ax_s, lm_s, wg_s = make_inputs(b=1, h=24, w=32, seed=5)

        def env_loss(fn, x, lm, w):
            return jnp.sum(fn(x, lm, w) * 0.7)

        ge = jax.device_get(
            jax.jit(jax.grad(lambda *a: env_loss(sg_envmap, *a),
                             argnums=(0, 1, 2)))(ax_s, lm_s, wg_s)
        )
        fe = jax.device_get(jax.jit(sg_envmap)(ax_s, lm_s, wg_s))
        cpu = jax.devices("cpu")[0]
        with jax.enable_x64(True), jax.default_device(cpu):
            a64 = [jnp.asarray(np.asarray(a), jnp.float64)
                   for a in (ax_s, lm_s, wg_s)]
            g64 = jax.device_get(
                jax.grad(lambda *a: env_loss(sg.sg_to_envmap, *a),
                         argnums=(0, 1, 2))(*a64)
            )
            f64 = jax.device_get(sg.sg_to_envmap(*a64))
        eok, eworst = gate_grads(
            g64, ge, 2e-2, label=" envmap", names=["axis", "lamb", "weight"]
        )
        f_err = float(np.abs(np.asarray(fe, np.float64) - f64).max()) / max(
            float(np.abs(f64).max()), 1.0
        )
        eok = eok and f_err <= 5e-3
        extra["gate_envmap"] = "pass" if eok else "FAIL"
        extra["gate_envmap_grad_rel_vs_f64"] = float(f"{eworst:.3e}")
        log(f"envmap gate {'pass' if eok else 'FAIL'} "
            f"(fwd {f_err:.2e}, grad {eworst:.2e} vs f64)")
        if not eok:
            RESULT["metric"] = "sg_shading_fwd_bwd_throughput_GRAD_MISMATCH"
        emit()

    if remaining() > 60:
        # on-device bilateral solve fwd+bwd per 120x160 image (VERDICT r1 #4)
        from inverserenderingofindoorscene_tpu.ops.bilateral import (
            MODE_PARAMS,
            bilateral_solve,
        )

        rng = np.random.RandomState(0)
        guide = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
        target = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
        conf = jnp.asarray(rng.rand(1, H, W, 1), jnp.float32)

        def bs_loss(t, c):
            return jnp.sum(
                bilateral_solve(guide, t, c, MODE_PARAMS[0], H * W)
            )

        g_bs = jax.jit(jax.grad(bs_loss, argnums=(0, 1)))
        log("compiling bilateral fwd+bwd ...")
        fence(g_bs(target, conf))
        dt_bs, _ = timeit(g_bs, (target, conf), target_s=2.0)
        extra["bilateral_fwd_bwd_ms"] = round(dt_bs * 1e3, 3)
        log(f"bilateral fwd+bwd {dt_bs*1e3:.3f} ms / image")
        emit()

    if remaining() > 60:
        # r3: the edge-list blur + capacity-bucket path (the production
        # default of the train CLI / inference chain) at the same shape —
        # exact (validated vs dense in tests), far fewer gather rows
        from inverserenderingofindoorscene_tpu.ops.bilateral import (
            bilateral_solve_stats,
            edge_bucket,
        )

        _, st = jax.jit(
            lambda t, c: bilateral_solve_stats(
                guide, t, c, MODE_PARAMS[0], H * W, 8 * H * W
            )
        )(target, conf)
        e_cap = edge_bucket(int(np.asarray(st["nedges"]).max()), H * W)

        def bs_loss_e(t, c):
            return jnp.sum(
                bilateral_solve(guide, t, c, MODE_PARAMS[0], H * W, e_cap)
            )

        g_bse = jax.jit(jax.grad(bs_loss_e, argnums=(0, 1)))
        log(f"compiling bilateral edge-mode fwd+bwd (e_cap={e_cap}) ...")
        fence(g_bse(target, conf))
        dt_bse, _ = timeit(g_bse, (target, conf), target_s=2.0)
        extra["bilateral_edge_fwd_bwd_ms"] = round(dt_bse * 1e3, 3)
        log(f"bilateral edge-mode fwd+bwd {dt_bse*1e3:.3f} ms / image")
        emit()

    log(f"done with {remaining():.0f}s of budget left")


if __name__ == "__main__":
    main()
