"""B1 serving A/B: the SG decode + shading portion in isolation (VERDICT r3 #6).

At batch-1 inference the fused Pallas kernels LOSE to the jnp path on the
full chain (BASELINE.md r2: 83.2 vs 97.8 ms/image). This isolates the SG
portion at the inference operating point (B1, 120x160 grid, SG12) and
times each candidate on-chip, same process, interleaved (tunnel drift is
hour-scale):

  jnp        : sg.sg_to_envmap + RenderLayer.forward_env (the env route)
  pallas2    : sg_envmap + render_sg (two kernels, current --usePallas)
  envmap-only / render-only : kernel launches in isolation

Usage: python scripts/ab_b1_sg.py [--batch 1] [--rc 120 160] [--iters 30]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, args, iters, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    np.asarray(jax.tree_util.tree_leaves(out)[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--rc", type=int, nargs=2, default=[120, 160])
    ap.add_argument("--iters", type=int, default=30)
    opt = ap.parse_args()

    from inverserenderingofindoorscene_tpu.core import sg
    from inverserenderingofindoorscene_tpu.core.render_layer import RenderLayer
    from inverserenderingofindoorscene_tpu.ops.sg_render import (
        render_sg,
        render_sg_env,
        sg_envmap,
    )

    b = opt.batch
    r, c = opt.rc
    k = 12
    rng = np.random.RandomState(0)
    axis = rng.randn(b, r, c, k, 3).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    lamb01 = rng.uniform(0.1, 0.9, (b, r, c, k)).astype(np.float32)
    w01 = rng.uniform(0.1, 0.9, (b, r, c, k, 3)).astype(np.float32)
    albedo = rng.uniform(0, 1, (b, r, c, 3)).astype(np.float32)
    normal = rng.randn(b, r, c, 3).astype(np.float32)
    normal[..., 2] = np.abs(normal[..., 2]) + 0.3
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    rough = rng.uniform(-1, 1, (b, r, c, 1)).astype(np.float32)

    args = tuple(jnp.asarray(x) for x in
                 (axis, lamb01, w01, albedo, normal, rough))

    layer = RenderLayer(env_rows=r, env_cols=c, env_height=8, env_width=16)

    @jax.jit
    def jnp_path(axis, lamb01, w01, albedo, normal, rough):
        lamb = sg.unsquash(lamb01)
        weight = sg.unsquash(w01)
        env = sg.sg_to_envmap(axis, lamb, weight, 8, 16)
        d, s = layer.forward_env(albedo, normal, rough, env)
        return env, d, s

    @jax.jit
    def pallas2(axis, lamb01, w01, albedo, normal, rough):
        lamb = sg.unsquash(lamb01)
        weight = sg.unsquash(w01)
        env = sg_envmap(axis, lamb, weight, 8, 16, interpret=False)
        d, s = render_sg(albedo, normal, rough, axis, lamb, weight,
                         env_height=8, env_width=16, interpret=False)
        return env, d, s

    @jax.jit
    def pallas_fused(axis, lamb01, w01, albedo, normal, rough):
        lamb = sg.unsquash(lamb01)
        weight = sg.unsquash(w01)
        d, s, env = render_sg_env(albedo, normal, rough, axis, lamb,
                                  weight, env_height=8, env_width=16,
                                  interpret=False)
        return env, d, s

    @jax.jit
    def env_only(axis, lamb01, w01, albedo, normal, rough):
        lamb = sg.unsquash(lamb01)
        weight = sg.unsquash(w01)
        return sg_envmap(axis, lamb, weight, 8, 16, interpret=False)

    @jax.jit
    def render_only(axis, lamb01, w01, albedo, normal, rough):
        lamb = sg.unsquash(lamb01)
        weight = sg.unsquash(w01)
        return render_sg(albedo, normal, rough, axis, lamb, weight,
                         env_height=8, env_width=16, interpret=False)

    @jax.jit
    def jnp_env_only(axis, lamb01, w01, albedo, normal, rough):
        lamb = sg.unsquash(lamb01)
        weight = sg.unsquash(w01)
        return sg.sg_to_envmap(axis, lamb, weight, 8, 16)

    @jax.jit
    def jnp_render_from_env(env, albedo, normal, rough):
        return layer.forward_env(albedo, normal, rough, env)

    env0 = jnp_env_only(*args)
    cands = [
        ("jnp full (decode+render)", jnp_path, args),
        ("pallas2 (sg_envmap + render_sg)", pallas2, args),
        ("pallas fused (render_sg_env)", pallas_fused, args),
        ("pallas sg_envmap only", env_only, args),
        ("pallas render_sg only", render_only, args),
        ("jnp decode only", jnp_env_only, args),
        ("jnp render-from-env only", jnp_render_from_env,
         (env0, args[3], args[4], args[5])),
    ]
    for name, fn, a in cands:
        print(f"compiling {name} ...", flush=True)
        fn(*a)
    # interleaved timing, 2 rounds
    res = {}
    for rnd in range(2):
        for name, fn, a in cands:
            ms = timeit(fn, a, opt.iters)
            res.setdefault(name, []).append(ms)
    for name, ms in res.items():
        print(f"B{b} {r}x{c}: {name:34s} {min(ms):7.2f} ms "
              f"(runs: {' '.join(f'{m:.2f}' for m in ms)})", flush=True)


def probe_transfer():
    """Is the ~25 ms cost of producing the [1,120,160,128,3] envmap
    COMPUTE or WIRE?  Same kernel, output returned vs reduced on-device."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 120, 160, 12, 3).astype(np.float32))

    @jax.jit
    def full(x):
        # ~same output size as the envmap decode, trivial compute
        return jnp.broadcast_to(x[..., :1, :], (1, 120, 160, 128, 3)) * 2.0

    @jax.jit
    def reduced(x):
        return (jnp.broadcast_to(x[..., :1, :],
                                 (1, 120, 160, 128, 3)) * 2.0).sum()

    for name, fn in (("return 29.5MB", full), ("return scalar", reduced)):
        ms = timeit(fn, (x,), 30)
        print(f"transfer probe: {name:15s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    if "--probe" in sys.argv:
        sys.argv.remove("--probe")
        probe_transfer()
    else:
        main()
