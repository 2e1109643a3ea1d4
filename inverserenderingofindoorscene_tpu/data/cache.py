"""Packed decode cache: one-time decode of an OpenRooms dataset into
memmapped shards, so per-epoch reads are a slice + two multiplies.

Why this exists (and why the reference never could): every expensive
transform in the loader is epoch-INVARIANT — the RGBE decode + 2x2 pool
of the 1920x5120 envmap (~105 core-ms with the native decoder), the PIL
LDR decodes/resizes, the mask erosion, the depth read, and even the
95th-percentile exposure pivot.  The only per-epoch randomness is the
exposure scale (dataLoader.py:251-259), which is ONE rng draw and a
multiply.  The reference re-decodes everything every epoch with 8-16
worker processes (/root/reference/trainBRDF.py:136-137); this module
decodes once into ``open_memmap`` shards and replays epochs at page-cache
bandwidth, which is what lets a 4-core host feed a 68-101 ms TPU step
(scripts/bench_loader.py --cache has the measurements; BASELINE.md has
the before/after).

Exactness contract (tested in tests/test_real_loaders.py):
  * every LDR-derived field, depth, segs, and the exposure SCALE itself
    are bitwise identical to the direct loader (the cache stores the
    decoded float32 arrays and the pivot; the per-epoch rng stream is
    keyed by (seed, epoch, item) exactly like the direct path);
  * ``im`` is bitwise identical (same ``np.clip(scale * hdr, 0, 1)`` on
    the same float32 values);
  * ``env_gt`` matches to ~1 ulp: the direct native path folds the scale
    into the pool accumulation (native/rgbe_decode.c) while the cache
    multiplies the scale-1 pooled tensor — same math, different rounding
    order.
  * ``half=True`` stores the two HDR tensors (im, env_gt) as float16
    (values saturate at 65504) — NOT bitwise, ~1e-3 relative; use for
    bandwidth-constrained hosts.
"""

from __future__ import annotations

import hashlib
import json
import os
import os.path as osp
from typing import Optional

import numpy as np

CACHE_VERSION = 1

# fields derivable at read time / not stored
_DERIVED = ("seg_all", "name")


class _BufferPool:
    """Recycled batch buffers.  On this class of VM, faulting in FRESH
    anonymous memory costs ~75 ms per 29.5 MB envmap item (measured:
    `m[i]*s` 75 ms vs 6.2 ms into a warm buffer) — so per-batch
    allocations, not decode work, would dominate the cached read path.
    A buffer is reused only when nothing outside the pool references it
    (refcount check), so a consumer that retains batches is always safe
    — the pool just grows to cover the in-flight depth."""

    def __init__(self):
        import threading

        self._pools: dict = {}
        # two BatchIterators over one cached dataset = two producer
        # threads; without the lock both could see refcount==3 on the
        # same buffer before either stores it, and hand it out twice
        self._lock = threading.Lock()

    # picklable (spawned process-pool workers ship the dataset, which
    # carries a pool): state is transient, a worker starts empty
    def __getstate__(self):
        return {}

    def __setstate__(self, state):
        self.__init__()

    def get(self, key, shape, dtype):
        import sys

        with self._lock:
            pool = self._pools.setdefault(key, [])
            for a in pool:
                # 3 == the pool's reference + the loop variable +
                # getrefcount's own argument: nothing else holds this
                # buffer (the lock makes check-then-return atomic)
                if (a.shape == shape and a.dtype == dtype
                        and sys.getrefcount(a) == 3):
                    return a
            a = np.zeros(shape, dtype)  # zeros: fault the pages ONCE, here
            pool.append(a)
            return a
# 0/1 float masks stored as uint8 (exact, 4x smaller)
_U8_FIELDS = ("seg_area", "seg_env", "seg_brdf")
# HDR tensors eligible for float16 storage under half=True
_HALF_FIELDS = ("im", "env_gt")


class CachedOpenRoomsDataset:
    """Drop-in replacement for ``OpenRoomsDataset`` backed by a packed
    on-disk cache (same ``__getitem__`` contract, same (seed, epoch,
    item)-keyed augmentation stream).

    The cache directory is keyed by a signature of the loader config and
    the source files' (path, size, mtime) — regenerate the dataset and
    the cache rebuilds itself.  ``meta.json`` is written last and marks
    completeness; a crashed build leaves no usable half-cache.
    """

    def __init__(self, dataset, cache_root: str, workers: int = 4,
                 half: bool = False, verbose: bool = True):
        self.ds = dataset
        self.half = bool(half)
        self.verbose = verbose
        sig = self._signature()
        name = "irois_%s%s" % (sig[:16], "_h" if self.half else "")
        self.dir = osp.join(cache_root, name)
        self._mm: Optional[dict] = None
        self._pool = _BufferPool()
        if not osp.isfile(osp.join(self.dir, "meta.json")):
            self._build(workers)

    # --- passthrough dataset contract ---
    def __len__(self):
        return len(self.ds)

    @property
    def im_list(self):
        return self.ds.im_list

    def set_epoch(self, epoch: int):
        self.ds.set_epoch(epoch)

    # --- signature / layout ---
    def _signature(self) -> str:
        ds = self.ds
        files = []
        for im_path in ds.im_list:
            paths = list(ds._paths(im_path).values())
            if ds.cascade_level > 0:
                stems = ["imbaseColor_", "imnormal_", "imroughness_",
                         "imdepth_", "imdiffuse_", "imspecular_"]
                if ds.is_light:
                    stems.append("imenv_")
                paths += [ds._pre_path(im_path, s) for s in stems]
            for p in paths:
                try:
                    st = os.stat(p)
                    files.append((p, st.st_size, st.st_mtime_ns))
                except OSError:
                    files.append((p, -1, -1))
        spec = {
            "version": CACHE_VERSION,
            "im_hw": list(ds.im_hw),
            "env_rc": list(ds.env_rc),
            "env_hw": list(ds.env_hw),
            "is_light": ds.is_light,
            "cascade_level": ds.cascade_level,
            "sg_num": ds.sg_num,
            "files": files,
        }
        blob = json.dumps(spec, sort_keys=True).encode()
        return hashlib.sha1(blob).hexdigest()

    def _field_dtype(self, key, arr):
        if key in _U8_FIELDS:
            return np.uint8
        if self.half and key in _HALF_FIELDS:
            return np.float16
        return arr.dtype

    # --- build ---
    _BUILD_CHUNK = 256  # items between durable progress points

    def _build(self, workers: int):
        """Chunked, RESUMABLE build.  A ``built.u8`` bitmap (one byte per
        item) records durable progress: items are decoded in chunks, the
        field memmaps are flushed, and only then are the chunk's bits set
        and flushed — so after a kill, every set bit is backed by flushed
        field rows and the rebuild does only the missing tail (plus at
        most one partially-flushed chunk, rewritten idempotently).
        ``meta.json`` is still written last and marks completeness; a
        reader never sees a half-cache.  At OpenRooms scale (~100k items,
        multi-TB light-stage caches: docs/data.md has the math) restart-
        from-zero is hours of decode — resume makes the build preemptible
        like the training it feeds."""
        from concurrent.futures import ThreadPoolExecutor
        import time

        ds = self.ds
        n = len(ds)
        assert n > 0, "empty dataset"
        os.makedirs(self.dir, exist_ok=True)
        t0 = time.time()
        raw0 = ds.load_raw(0)
        shapes = {}
        for k, v in raw0.items():
            if k in _DERIVED:
                continue
            v = np.asarray(v)
            shapes[k] = ((n,) + v.shape, self._field_dtype(k, v))

        bpath = osp.join(self.dir, "built.u8")
        resume = osp.isfile(bpath) and os.path.getsize(bpath) == n and all(
            osp.isfile(osp.join(self.dir, k + ".npy")) for k in shapes
        )
        if resume:
            built = np.memmap(bpath, dtype=np.uint8, mode="r+", shape=(n,))
            mms = {}
            for k, (shape, dtype) in shapes.items():
                m = np.load(osp.join(self.dir, k + ".npy"), mmap_mode="r+")
                if m.shape != shape or m.dtype != dtype:
                    resume = False
                    break
                mms[k] = m
        if not resume:
            built = np.memmap(bpath, dtype=np.uint8, mode="w+", shape=(n,))
            mms = {
                k: np.lib.format.open_memmap(
                    osp.join(self.dir, k + ".npy"), mode="w+",
                    dtype=dtype, shape=shape,
                )
                for k, (shape, dtype) in shapes.items()
            }

        def write(ind, raw=None):
            raw = ds.load_raw(ind) if raw is None else raw
            for k, mm in mms.items():
                v = np.asarray(raw[k])
                if mm.dtype == np.float16:
                    v = np.minimum(v, np.float32(65504.0))
                mm[ind] = v  # distinct rows: thread-safe

        todo = np.flatnonzero(built == 0)
        done0 = n - len(todo)
        if self.verbose and done0:
            print("packed cache: resuming build, %d/%d items already "
                  "durable" % (done0, n), flush=True)
        if not built[0]:
            write(0, raw0)
        pool = (ThreadPoolExecutor(max_workers=workers)
                if workers > 1 else None)
        try:
            for lo in range(0, len(todo), self._BUILD_CHUNK):
                chunk = [i for i in todo[lo:lo + self._BUILD_CHUNK]
                         if i != 0]
                if pool is not None:
                    list(pool.map(write, chunk))
                else:
                    for i in chunk:
                        write(i)
                # durability order: field rows first, THEN the bits
                for mm in mms.values():
                    mm.flush()
                built[todo[lo:lo + self._BUILD_CHUNK]] = 1
                built.flush()
        finally:
            if pool is not None:
                pool.shutdown()
        meta = {
            "version": CACHE_VERSION,
            "n": n,
            "half": self.half,
            "fields": sorted(mms),
        }
        tmp = osp.join(self.dir, ".meta.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, osp.join(self.dir, "meta.json"))
        if self.verbose:
            print("packed cache: built %d items (%d new) in %.1fs at %s"
                  % (n, len(todo), time.time() - t0, self.dir), flush=True)

    # --- read ---
    def _maps(self) -> dict:
        if self._mm is None:
            with open(osp.join(self.dir, "meta.json")) as f:
                meta = json.load(f)
            assert meta["n"] == len(self.ds), (meta["n"], len(self.ds))
            self._mm = {
                k: np.load(osp.join(self.dir, k + ".npy"), mmap_mode="r")
                for k in meta["fields"]
            }
        return self._mm

    def __getitem__(self, ind):
        ds = self.ds
        mm = self._maps()
        rng = ds._item_rng(ind)
        # the SAME draw order as the direct path: exposure first
        scale = ds._exposure_scale(np.float32(mm["pivot"][ind]), rng)

        out = {}
        for k, m in mm.items():
            if k == "pivot":
                continue
            row = m[ind]
            if k == "im":
                out[k] = np.clip(scale * np.asarray(row, np.float32), 0, 1)
            elif k == "env_gt":
                out[k] = np.asarray(row, np.float32) * np.float32(scale)
            elif m.dtype == np.uint8:
                out[k] = np.asarray(row, np.float32)
            else:
                out[k] = np.asarray(row)
        out["seg_all"] = out["seg_area"] + out["seg_brdf"]
        out["name"] = ds.im_list[ind]
        return out

    def get_batch(self, idxs):
        """Collated batch read into recycled buffers: ONE pass per field
        (read-multiply-write for the exposure-scaled tensors, a straight
        copy otherwise), no intermediate allocations, no np.stack.  Used
        by BatchIterator's thread/serial producer in place of per-item
        __getitem__ + collate."""
        ds = self.ds
        mm = self._maps()
        n = len(idxs)
        out = {}
        for k, m in mm.items():
            if k == "pivot":
                continue
            dt = (np.float32 if (m.dtype in (np.uint8, np.float16))
                  else m.dtype)
            out[k] = self._pool.get(k, (n,) + m.shape[1:], dt)
        seg_all = self._pool.get("seg_all", out["seg_area"].shape,
                                 np.float32)
        for j, ind in enumerate(idxs):
            rng = ds._item_rng(ind)
            scale = ds._exposure_scale(np.float32(mm["pivot"][ind]), rng)
            for k, buf in out.items():
                row = mm[k][ind]
                if k == "im":
                    np.multiply(row, scale, out=buf[j])
                    np.clip(buf[j], 0, 1, out=buf[j])
                elif k == "env_gt":
                    np.multiply(row, np.float32(scale), out=buf[j])
                else:
                    np.copyto(buf[j], row, casting="unsafe")
            np.add(out["seg_area"][j], out["seg_brdf"][j], out=seg_all[j])
        out["seg_all"] = seg_all
        out["name"] = [ds.im_list[i] for i in idxs]
        return out

    # --- pickling (spawned process-pool prefetch workers) ---
    def __getstate__(self):
        st = self.__dict__.copy()
        st["_mm"] = None  # reopened lazily in the worker
        st["_pool"] = _BufferPool()
        return st
