"""Input-pipeline throughput at the reference operating points (VERDICT r2 #5).

Generates a full-resolution on-disk OpenRooms-format dataset (real HDR
decode via cv2, full 120x160x(8x16) per-pixel envmap files — the same
formats the reference's 8-16 DataLoader worker PROCESSES decode,
/root/reference/trainBRDF.py:136-137) and measures BatchIterator items/s
against the measured train-step times:

  * BRDF stage: B16 at 240x320, step 101 ms  -> needs >= 158 img/s
  * Light stage: B5 + envmap GT decode, step 68 ms -> needs >= 74 img/s

Two numbers per config: loader ALONE (cold first epoch + warm epochs),
and loader OVERLAPPED with a busy-host simulation (the realistic case:
the host thread dispatches device steps while worker threads decode).

Usage: python scripts/bench_loader.py [--images 48] [--workers 1 2 4 8]
"""

import argparse
import os
import os.path as osp
import struct
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

IM_HW = (240, 320)
ENV_RC = (120, 160)
ENV_HW = (8, 16)


def log(m):
    print(m, flush=True)


def generate(root, n_images):
    """Full-res fixture in the reference's on-disk formats (the same
    recipe as tests/test_cli_smoke.py's fixture, at 240x320/120x160)."""
    import cv2

    scene = osp.join(root, "main_xml", "scene0001")
    done = osp.join(root, ".complete")
    if osp.isfile(done) and open(done).read() == str(n_images):
        return
    os.makedirs(scene, exist_ok=True)
    with open(osp.join(root, "train.txt"), "w") as f:
        f.write("scene0001\n")
    with open(osp.join(root, "test.txt"), "w") as f:
        f.write("scene0001\n")

    h, w = IM_HW
    r, c = ENV_RC
    eh, ew = ENV_HW
    rng = np.random.RandomState(0)
    t0 = time.time()
    for i in range(1, n_images + 1):
        hdr = rng.rand(h, w, 3).astype(np.float32)
        assert cv2.imwrite(osp.join(scene, f"im_{i}.hdr"), hdr[:, :, ::-1])

        def png(name, arr):
            cv2.imwrite(osp.join(scene, name), (arr * 255).astype(np.uint8))

        png(f"imbaseColor_{i}.png", rng.rand(h, w, 3))
        n = rng.uniform(-1, 1, (h, w, 3))
        n[..., 2] = np.abs(n[..., 2]) + 0.3
        n /= np.linalg.norm(n, axis=2, keepdims=True)
        png(f"imnormal_{i}.png", 0.5 * (n + 1))
        png(f"imroughness_{i}.png", rng.rand(h, w, 3))
        m = np.kron(rng.rand(h // 16, w // 16), np.ones((16, 16)))
        mask = np.where(m < 0.6, 255, np.where(m < 0.8, 128, 0)).astype(
            np.uint8
        )
        cv2.imwrite(osp.join(scene, f"immask_{i}.png"),
                    np.stack([mask] * 3, axis=-1))
        depth = rng.rand(h, w).astype(np.float32) * 4 + 0.2
        with open(osp.join(scene, f"imdepth_{i}.dat"), "wb") as f:
            f.write(struct.pack("i", h))
            f.write(struct.pack("i", w))
            f.write(depth.tobytes())
        # full-size per-pixel envmap GT: (r*eh, c*ew) HDR like the dataset
        env = rng.rand(r * eh * 2, c * ew * 2, 3).astype(np.float32)
        assert cv2.imwrite(osp.join(scene, f"imenv_{i}.hdr"),
                           env[:, :, ::-1])
    with open(done, "w") as f:
        f.write(str(n_images))
    log(f"generated {n_images} items in {time.time() - t0:.0f}s "
        f"(envmap files {r * eh * 2}x{c * ew * 2})")


def bench(root, batch, is_light, workers, epochs=3, busy=False,
          mode="thread", cache_dir=None, half=False):
    from inverserenderingofindoorscene_tpu.data.openrooms import (
        BatchIterator,
        OpenRoomsDataset,
    )

    ds = OpenRoomsDataset(root, im_hw=IM_HW, env_rc=ENV_RC,
                          is_light=is_light, is_all_light=is_light)
    if cache_dir is not None:
        from inverserenderingofindoorscene_tpu.data.cache import (
            CachedOpenRoomsDataset,
        )

        t0 = time.perf_counter()
        ds = CachedOpenRoomsDataset(ds, cache_dir, workers=4, half=half)
        build_s = time.perf_counter() - t0
        if build_s > 1.0:
            log(f"  cache build ({'f16' if half else 'f32'}): "
                f"{build_s:.1f}s one-time for {len(ds)} items")
    it = BatchIterator(ds, batch, num_workers=workers, seed=1, mode=mode)

    stop_busy = []
    if busy:
        # hold the GIL in short bursts on the main thread, like a host
        # driving jit dispatches between batches
        import threading

        def spin():
            x = np.zeros((256, 256), np.float32)
            while not stop_busy:
                x = x @ x.T / 65536.0 + 1.0
                time.sleep(0.001)

        th = threading.Thread(target=spin, daemon=True)
        th.start()

    times = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        n = 0
        for b in it:
            n += b["im"].shape[0]
        times.append(n / (time.perf_counter() - t0))
    if busy:
        stop_busy.append(True)
    it.close()
    return times  # items/s per epoch (first = cold cache)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/irois_loader_bench")
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--cache", action="store_true",
                    help="measure ONLY the packed-decode-cache modes")
    ap.add_argument("--no-direct", action="store_true",
                    help="skip the direct (re-decode every epoch) modes")
    opt = ap.parse_args()

    generate(opt.root, opt.images)
    cache_dir = osp.join(opt.root, "_cache")
    for stage, batch, is_light, step_ms in (
        ("brdf", 16, False, 101.1), ("light", 5, True, 68.4),
    ):
        need = batch / (step_ms / 1e3)
        if not opt.cache and not opt.no_direct:
            for mode in ("thread", "process"):
                for w in opt.workers:
                    rates = bench(opt.root, batch, is_light, w, mode=mode)
                    warm = max(rates[1:]) if len(rates) > 1 else rates[0]
                    verdict = ("keeps chip busy" if warm >= need
                               else "LOADER-BOUND")
                    log(f"{stage:5s} B{batch:<2d} {mode:7s} workers={w}: "
                        f"{' '.join(f'{r:6.1f}' for r in rates)} items/s "
                        f"(need {need:.1f} for the {step_ms} ms step) "
                        f"{verdict}")
            rates = bench(opt.root, batch, is_light, 4, busy=True,
                          mode="process")
            log(f"{stage:5s} B{batch:<2d} process workers=4 + busy host: "
                f"{' '.join(f'{r:6.1f}' for r in rates)} items/s")
        # packed decode cache (VERDICT r3 #2): decode once, replay epochs
        for half in (False, True):
            tag = "cache-f16" if half else "cache-f32"
            for w in opt.workers:
                rates = bench(opt.root, batch, is_light, w, mode="thread",
                              cache_dir=cache_dir, half=half, epochs=4)
                warm = max(rates[1:]) if len(rates) > 1 else rates[0]
                verdict = ("keeps chip busy" if warm >= need
                           else "LOADER-BOUND")
                log(f"{stage:5s} B{batch:<2d} {tag:9s} workers={w}: "
                    f"{' '.join(f'{r:6.1f}' for r in rates)} items/s "
                    f"(need {need:.1f}) {verdict}")
            rates = bench(opt.root, batch, is_light, 4, busy=True,
                          mode="thread", cache_dir=cache_dir, half=half,
                          epochs=4)
            log(f"{stage:5s} B{batch:<2d} {tag} workers=4 + busy host: "
                f"{' '.join(f'{r:6.1f}' for r in rates)} items/s")


if __name__ == "__main__":
    main()
