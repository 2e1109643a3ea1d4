"""Packed-cache scale hardening run: build, kill, resume at >=5k items.

OpenRooms is O(100k) items (/root/reference/dataLoader.py:15-319 over
the full scene list); the 48-item fixture runs in tests prove
correctness, not scale.  This script builds a >=5k-item tree (one real
procedurally-rendered scene, hardlinked into hundreds of scene dirs —
decode cost is per PATH, so the build does full-scale work on ~zero
extra disk for sources), then:

  1. times a cold parallel build of the BRDF-stage cache,
  2. SIGKILLs a fresh build at ~50% and times the RESUMED build
     (data/cache.py: chunked durable bitmap) to show only the tail is
     re-decoded,
  3. prints the measured bytes/item and items/s and extrapolates the
     disk + wall budget to OpenRooms scale for both stages.

The recorded numbers live in docs/data.md ("Scale" section).

Usage:  python scripts/cache_scale.py [--items 5000] [--out /tmp/irois_cache5k]
"""

import argparse
import os
import os.path as osp
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

IM_HW = (120, 160)
ENV_RC = (60, 80)
PER_SCENE = 12


def log(m):
    print(m, flush=True)


def build_tree(out, n_items):
    """One rendered fixture scene, hardlinked into n_items/PER_SCENE
    scene dirs."""
    from inverserenderingofindoorscene_tpu.data.fixture import (
        write_openrooms_fixture,
    )

    src_root = osp.join(out, "src_fixture")
    write_openrooms_fixture(src_root, n_scenes=1, per_scene=PER_SCENE,
                            n_test_scenes=0, im_hw=IM_HW, env_rc=ENV_RC)
    src_scene = osp.join(src_root, "main_xml", "scene0000")
    tree = osp.join(out, "tree")
    n_scenes = (n_items + PER_SCENE - 1) // PER_SCENE
    names = []
    for s in range(n_scenes):
        rel = "scene%05d" % s
        names.append(rel)
        dst = osp.join(tree, "main_xml", rel)
        if osp.isdir(dst):
            if len(os.listdir(dst)) == len(os.listdir(src_scene)):
                continue  # complete from a prior run
            shutil.rmtree(dst)  # partial dir from a killed run: redo
        tmp = dst + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        for f in os.listdir(src_scene):
            os.link(osp.join(src_scene, f), osp.join(tmp, f))
        os.rename(tmp, dst)  # a scene dir exists only when complete
    with open(osp.join(tree, "train.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(osp.join(tree, "test.txt"), "w") as f:
        f.write(names[0] + "\n")
    return tree, n_scenes * PER_SCENE


def make_ds(tree, light=False):
    from inverserenderingofindoorscene_tpu.data.openrooms import (
        OpenRoomsDataset,
    )

    return OpenRoomsDataset(tree, im_hw=IM_HW, env_rc=ENV_RC,
                            is_light=light, is_all_light=light, seed=0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=5000)
    ap.add_argument("--out", default="/tmp/irois_cache5k")
    ap.add_argument("--workers", type=int, default=4)
    opt = ap.parse_args(argv)

    from inverserenderingofindoorscene_tpu.data.cache import (
        CachedOpenRoomsDataset,
    )

    os.makedirs(opt.out, exist_ok=True)
    t0 = time.time()
    tree, n = build_tree(opt.out, opt.items)
    log(f"tree: {n} items (hardlinked) in {time.time() - t0:.1f}s")

    # --- 1. cold parallel build ---
    cache1 = osp.join(opt.out, "cache_cold")
    shutil.rmtree(cache1, ignore_errors=True)
    ds = make_ds(tree)
    t0 = time.time()
    cached = CachedOpenRoomsDataset(ds, cache1, workers=opt.workers)
    cold_s = time.time() - t0
    size = sum(os.stat(osp.join(cached.dir, f)).st_size
               for f in os.listdir(cached.dir))
    per_item = size / n
    log(f"cold build: {n} items in {cold_s:.1f}s "
        f"({n / cold_s:.0f} items/s, {opt.workers} workers); "
        f"shard {size / 1e9:.2f} GB = {per_item / 1e6:.3f} MB/item (BRDF)")

    # --- 2. kill at ~50%, resume ---
    cache2 = osp.join(opt.out, "cache_kill")
    shutil.rmtree(cache2, ignore_errors=True)
    prog = f"""
import sys
sys.path.insert(0, {osp.dirname(osp.dirname(osp.abspath(__file__)))!r})
from scripts.cache_scale import make_ds
from inverserenderingofindoorscene_tpu.data.cache import CachedOpenRoomsDataset
CachedOpenRoomsDataset(make_ds({tree!r}), {cache2!r}, workers={opt.workers})
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.Popen([sys.executable, "-c", prog], env=env)
    bpath = None
    killed_at = None
    try:
        deadline = time.time() + max(600, 6 * cold_s)
        while time.time() < deadline:
            if bpath is None and osp.isdir(cache2):
                for d in os.listdir(cache2):
                    q = osp.join(cache2, d, "built.u8")
                    if osp.isfile(q):
                        bpath = q
            if bpath:
                bits = np.fromfile(bpath, np.uint8)
                if bits.sum() >= n // 2:
                    killed_at = int(bits.sum())
                    break
            if p.poll() is not None:
                break
            time.sleep(0.1)
    finally:
        p.kill()  # this exact child pid only
        p.wait()
    assert bpath is not None and killed_at is not None and killed_at < n, (
        "build finished before the kill point; raise --items")
    log(f"killed cold build at {killed_at}/{n} durable items")
    shard = osp.dirname(bpath)
    assert not osp.isfile(osp.join(shard, "meta.json"))
    t0 = time.time()
    CachedOpenRoomsDataset(make_ds(tree), cache2, workers=opt.workers)
    resume_s = time.time() - t0
    assert osp.isfile(osp.join(shard, "meta.json"))
    tail = n - killed_at
    log(f"resume: remaining {tail} items in {resume_s:.1f}s "
        f"({tail / resume_s:.0f} items/s) — "
        f"{100.0 * resume_s / cold_s:.0f}% of a from-scratch build for "
        f"{100.0 * tail / n:.0f}% of the items")

    # --- 3. spot-check bitwise vs the direct loader ---
    cached2 = CachedOpenRoomsDataset(make_ds(tree), cache2,
                                     workers=opt.workers)
    direct = make_ds(tree)
    rng = np.random.RandomState(0)
    for i in rng.choice(n, 8, replace=False):
        a, b = direct[int(i)], cached2[int(i)]
        np.testing.assert_array_equal(b["im"], a["im"])
        np.testing.assert_array_equal(b["albedo"], a["albedo"])
    log("spot-check: 8 random items bitwise-identical to the direct loader")

    # --- 4. scale math ---
    env_bytes = int(np.prod((ENV_RC[0], ENV_RC[1], 128, 3))) * 4
    light_item = per_item + env_bytes  # + pooled envmap GT, f32
    light_half = per_item + env_bytes // 2  # --itemCacheHalf (f16 HDR)
    for scale in (100_000,):
        log(f"extrapolation to {scale} items (OpenRooms order): "
            f"BRDF cache {scale * per_item / 1e9:.0f} GB, "
            f"build {scale / (n / cold_s) / 60:.0f} min at this host's "
            f"{n / cold_s:.0f} items/s; light cache "
            f"{scale * light_item / 1e12:.2f} TB f32 "
            f"({scale * light_half / 1e12:.2f} TB half) "
            f"— one memmap per field, page-granular random reads, no "
            f"per-file shard cap needed below ext4's 16 TiB limit")
    return 0


if __name__ == "__main__":
    sys.exit(main())
