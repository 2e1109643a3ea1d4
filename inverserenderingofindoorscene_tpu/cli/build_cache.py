"""Prebuild the packed decode cache for a dataset (ops convenience).

The train CLIs build the cache lazily on first use (--itemCache DIR);
this driver builds it ahead of time — e.g. on a fat staging host before
a fleet of training jobs mounts it read-only — and prints per-split
shard statistics.  See docs/data.md and data/cache.py for the design.

Usage:
  python -m inverserenderingofindoorscene_tpu.cli.build_cache \
      --dataRoot $DATA --itemCache /cache/dir [--light] [--phases TRAIN TEST]
"""

from __future__ import annotations

import os
import os.path as osp
import time

from inverserenderingofindoorscene_tpu.cli import common


def parse_args(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--light", action="store_true",
                   help="build the light-stage cache (envmap GT shards) "
                        "instead of the BRDF-stage one")
    p.add_argument("--phases", nargs="+", default=["TRAIN", "TEST"],
                   choices=["TRAIN", "TEST"])
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)
    assert opt.itemCache, "--itemCache DIR is required"
    assert opt.dataRoot, "--dataRoot is required"
    from inverserenderingofindoorscene_tpu.data.cache import (
        CachedOpenRoomsDataset,
    )
    from inverserenderingofindoorscene_tpu.data.openrooms import (
        OpenRoomsDataset,
    )

    for phase in opt.phases:
        ds = OpenRoomsDataset(
            opt.dataRoot,
            im_hw=(opt.imHeight, opt.imWidth),
            phase=phase,
            cascade_level=opt.cascadeLevel,
            is_light=opt.light,
            is_all_light=opt.light,
            env_hw=(opt.envHeight, opt.envWidth),
            env_rc=(opt.envRow, opt.envCol),
            sg_num=opt.SGNum,
            seed=opt.seed,
        )
        if len(ds) == 0:
            print(f"{phase}: 0 items, skipping")
            continue
        t0 = time.time()
        cached = CachedOpenRoomsDataset(
            ds, opt.itemCache, workers=max(opt.numWorkers, 1),
            half=opt.itemCacheHalf,
        )
        size = sum(
            os.stat(osp.join(cached.dir, f)).st_size
            for f in os.listdir(cached.dir)
        )
        print(f"{phase}: {len(ds)} items -> {cached.dir} "
              f"({size / 1e6:.0f} MB, {time.time() - t0:.1f}s; "
              f"{'reused existing' if time.time() - t0 < 1.0 else 'built'})")


if __name__ == "__main__":
    main()
