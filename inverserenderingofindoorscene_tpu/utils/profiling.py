"""Profiling & roofline accounting (greenfield — the reference has none,
SURVEY.md §5.1).

Two tools:
  * ``trace(logdir)``: context manager around ``jax.profiler`` for
    TensorBoard-compatible device traces.
  * ``Roofline``: analytic op accounting for the hot kernels, used to
    report achieved fraction of VPU/HBM peaks next to measured times
    (the basis of the numbers in BASELINE.md).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace via jax.profiler (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Peak numbers for the chips this framework targets (f32 VPU lane-ops/s,
# HBM bytes/s). Approximate public figures; used for achieved-% reporting
# only, not for scheduling.
CHIP_PEAKS = {
    "v5e": {"vpu_f32_ops": 1.9e12, "hbm_bytes": 8.19e11},
    "v5p": {"vpu_f32_ops": 3.7e12, "hbm_bytes": 2.765e12},
}


@dataclasses.dataclass
class Roofline:
    """Analytic cost of one kernel invocation."""

    lane_ops: float  # total elementwise lane-ops (f32)
    hbm_bytes: float
    transcendentals: float = 0.0
    chip: str = "v5e"

    def report(self, seconds: float) -> dict:
        peaks = CHIP_PEAKS[self.chip]
        compute_bound = self.lane_ops / peaks["vpu_f32_ops"]
        memory_bound = self.hbm_bytes / peaks["hbm_bytes"]
        bound = max(compute_bound, memory_bound)
        return {
            "time_s": seconds,
            "light_speed_s": bound,
            "achieved_frac": bound / seconds if seconds > 0 else 0.0,
            "bound": "compute" if compute_bound >= memory_bound else "memory",
        }


def sg_render_roofline(n_pixels: int, sg_num: int = 12, dirs: int = 128,
                       backward: bool = True, chip: str = "v5e") -> Roofline:
    """Op count for the fused SG shading kernel (ops/sg_render.py).

    Per pixel: ~5 wide ops per lobe for the SG mixture and ~110 for the
    GGX shading chain, each over the direction lanes."""
    per_pixel = (5 * sg_num + 110) * dirs
    if backward:
        per_pixel *= 1.6  # measured fwd+bwd / fwd ratio (BASELINE.md)
    in_bytes = n_pixels * (10 + 7 * sg_num) * 4
    out_bytes = n_pixels * 6 * 4
    if backward:
        in_bytes, out_bytes = in_bytes + out_bytes, in_bytes
    return Roofline(
        lane_ops=n_pixels * per_pixel,
        hbm_bytes=in_bytes + out_bytes,
        transcendentals=n_pixels * (sg_num + 2) * dirs,
        chip=chip,
    )


def measure(fn, args, iters: int = 30) -> float:
    """Amortized per-call seconds with a hard host-transfer fence
    (block_until_ready is unreliable on tunnel backends — BASELINE.md).

    CAVEAT: the fence transfers the FIRST output leaf to host once; over a
    slow tunnel that transfer is amortized into the result (~130 MB/s ⇒ a
    40 MB output biases by ~300ms/iters). For unbiased numbers make ``fn``
    return a SCALAR (e.g. a sum of its outputs)."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters
