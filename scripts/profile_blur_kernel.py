"""Feasibility micro-bench: can a Pallas kernel beat XLA's scalar-core
gather for the bilateral blur?

The blur is out = 2*D*y + sum_d y[nbr[d]] with nbr MONOTONE per
direction (vertex ids are assigned in packed-key sort order, so a fixed
key shift preserves order).  Monotonicity means each 128-row tile's
neighbors live in a bounded window of the source array, so the gather
can be computed on the MXU/VPU as (one-hot [T,R]) @ (window [R,C]) with
the window dynamic-sliced from VMEM — no scalar-core row loop.

This script times ONE 8-direction blur pass at the bench operating
point (V=19200, C=8-padded) for:
  * the XLA formulation ops/bilateral.py uses (8 gathers + masked adds),
  * the Pallas windowed one-hot kernel at R in {512, 1024, 2048},
with synthetic monotone indices whose spread fits the window (the real
op needs a spill fallback; this measures the raw speed ceiling first).
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = 19200
C = 8
T = 128
DIRS = 8
ITERS = 30


def make_indices(rng, spread):
    """Monotone per-direction indices with bounded tile spread, plus
    ~10% missing (-1) entries like real neighbor tables."""
    nbr = np.zeros((DIRS, V), np.int32)
    for d in range(DIRS):
        jitter = rng.randint(-spread, spread, V)
        idx = np.clip(np.sort(np.arange(V) + jitter), 0, V - 1)
        nbr[d] = idx
    miss = rng.rand(DIRS, V) < 0.1
    return np.where(miss, -1, nbr)


def make_offs(nbr, r):
    """Per-(direction, tile) window starts, 128-aligned, for window r."""
    offs = np.zeros((DIRS, (V + T - 1) // T), np.int32)
    for d in range(DIRS):
        for j in range(offs.shape[1]):
            tile = nbr[d, j * T:(j + 1) * T]
            valid = tile[tile >= 0]
            lo = int(valid.min()) if len(valid) else 0
            offs[d, j] = max(0, min(lo // 128 * 128, V - r))
    return offs


def xla_blur(y, nbr):
    out = 2.0 * 5 * y
    for d in range(DIRS):
        idx = nbr[d]
        out = out + jnp.where(
            (idx >= 0)[:, None], y[jnp.maximum(idx, 0)], 0.0
        )
    return out


INTERPRET = "--interpret" in sys.argv


def make_pallas_blur(r):
    ntiles = V // T

    def kernel(offs_ref, nbr_ref, y_ref, out_ref):
        # nbr_ref is [V, DIRS] (dirs on lanes): every dynamic slice must
        # be on the SUBLANE dim — a dynamic lane-dim slice does not
        # compile (the opaque HTTP-500 Mosaic failure of the first cut).
        j = pl.program_id(0)
        row0 = j * T
        acc = 2.0 * 5 * y_ref[pl.ds(row0, T), :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, r), 1)
        idx_all = nbr_ref[pl.ds(row0, T), :]
        for d in range(DIRS):
            s = pl.multiple_of(offs_ref[d, j], 128)
            idx = idx_all[:, d:d + 1]  # [T, 1]
            win = y_ref[pl.ds(s, r), :]
            oh = (((idx - s) == iota) & (idx >= 0)).astype(jnp.float32)
            # HIGHEST precision: the default MXU pass rounds the gathered
            # window values to bf16 (measured 4e-2 abs error); bf16x3
            # reconstructs the exact f32 selection (measured maxdiff 0.0)
            acc = acc + jax.lax.dot_general(
                oh, win, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        out_ref[pl.ds(row0, T), :] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nbr
            pl.BlockSpec(memory_space=pltpu.VMEM),  # y
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((V, C), jnp.float32),
        interpret=INTERPRET,
    )


def scan_time(fn, *args):
    @jax.jit
    def many(*args):
        def body(c, _):
            y2 = fn(args[0] + c, *args[1:])
            return c + y2[0, 0], None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    np.asarray(many(*args))
    t0 = time.perf_counter()
    np.asarray(many(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.RandomState(0)
    spread = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    nbr_np = make_indices(rng, spread)
    y = jnp.asarray(rng.randn(V, C), jnp.float32)
    nbr = jnp.asarray(nbr_np)

    ref = np.asarray(jax.jit(xla_blur)(y, nbr))
    t = scan_time(lambda yy, nn: xla_blur(yy, nn), y, nbr)
    print(f"xla 8-gather blur      {t:6.3f} ms", flush=True)

    for r in (512, 1024, 2048):
        offs_np = make_offs(nbr_np, r)
        ok = True  # windows must cover every valid index at this R
        for d in range(DIRS):
            for j in range(V // T):
                tile = nbr_np[d, j * T:(j + 1) * T]
                valid = tile[tile >= 0]
                if len(valid) and (valid - offs_np[d, j]).max() >= r:
                    ok = False
        offs = jnp.asarray(offs_np)
        nbr_t = jnp.asarray(nbr_np.T.copy())  # [V, DIRS], dirs on lanes
        blur = make_pallas_blur(r)
        fn = lambda yy, oo, nn: blur(oo, nn, yy)
        out = np.asarray(jax.jit(fn)(y, offs, nbr_t))
        err = np.abs(out - ref).max() if ok else float("nan")
        t = scan_time(fn, y, offs, nbr_t)
        print(
            f"pallas windowed R={r:<5} {t:6.3f} ms  maxdiff {err:.2e}"
            f"{'' if ok else '  (spread>R: parity skipped)'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
