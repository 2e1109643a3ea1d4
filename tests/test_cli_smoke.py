"""End-to-end CLI smoke tests over a tiny on-disk OpenRooms fixture.

Builds a real dataset tree (hdr/png/dat/h5 files with the reference's
formats), then runs each stage driver for a couple of steps. This is the
integration test of loaders + pipelines + train steps + checkpointing.
"""

import os
import os.path as osp
import struct

import numpy as np
import pytest

import jax

# Excluded from the fast pre-commit gate (pytest -m 'not slow'); see
# [tool.pytest.ini_options] in pyproject.toml.
pytestmark = pytest.mark.slow

IM_HW = (64, 64)
ENV_RC = (32, 32)
NIMG = 3


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("openrooms")
    scene_rel = "scene0001"
    (root / "main_xml" / scene_rel).mkdir(parents=True)
    scene = root / "main_xml" / scene_rel
    (root / "train.txt").write_text(scene_rel + "\n")
    (root / "test.txt").write_text(scene_rel + "\n")

    rng = np.random.RandomState(0)
    h, w = IM_HW
    r, c = ENV_RC
    for i in range(1, NIMG + 1):
        hdr = rng.rand(h, w, 3).astype(np.float32)
        assert cv2.imwrite(str(scene / f"im_{i}.hdr"), hdr[:, :, ::-1])

        def png(name, arr):
            cv2.imwrite(str(scene / name), (arr * 255).astype(np.uint8))

        png(f"imbaseColor_{i}.png", rng.rand(h, w, 3))
        n = rng.uniform(-1, 1, (h, w, 3))
        n[..., 2] = np.abs(n[..., 2]) + 0.3
        n /= np.linalg.norm(n, axis=2, keepdims=True)
        png(f"imnormal_{i}.png", 0.5 * (n + 1))
        png(f"imroughness_{i}.png", rng.rand(h, w, 3))
        # 3-band mask: ~60% obj (255), ~20% area (128), rest env (0);
        # blocky so the 7x7 light-mode erosion keeps most of segObj
        m = np.kron(rng.rand(h // 16, w // 16), np.ones((16, 16)))
        mask = np.where(m < 0.6, 255, np.where(m < 0.8, 128, 0)).astype(
            np.uint8
        )
        cv2.imwrite(str(scene / f"immask_{i}.png"),
                    np.stack([mask] * 3, axis=-1))
        depth = (rng.rand(h, w).astype(np.float32) * 4 + 0.2)
        with open(scene / f"imdepth_{i}.dat", "wb") as f:
            f.write(struct.pack("i", h))
            f.write(struct.pack("i", w))
            f.write(depth.tobytes())
        env = rng.rand(r * 16, c * 32, 3).astype(np.float32)
        assert cv2.imwrite(str(scene / f"imenv_{i}.hdr"), env[:, :, ::-1])
    return str(root)


def _args(dataset, extra):
    return [
        "--dataRoot", dataset,
        "--imHeight", str(IM_HW[0]), "--imWidth", str(IM_HW[1]),
        "--envRow", str(ENV_RC[0]), "--envCol", str(ENV_RC[1]),
        "--batchSize", "2", "--nepoch", "1", "--maxSteps", "2",
        "--numWorkers", "0",
    ] + extra


def test_openrooms_loader_contract(dataset):
    from inverserenderingofindoorscene_tpu.data.openrooms import (
        BatchIterator,
        OpenRoomsDataset,
    )

    ds = OpenRoomsDataset(
        dataset, im_hw=IM_HW, env_rc=ENV_RC, is_light=True, is_all_light=True
    )
    assert len(ds) == NIMG
    item = ds[0]
    h, w = IM_HW
    assert item["im"].shape == (h, w, 3)
    assert item["im"].min() >= 0 and item["im"].max() <= 1
    assert item["albedo"].shape == (h, w, 3)
    nn = np.linalg.norm(item["normal"], axis=2)
    np.testing.assert_allclose(nn[nn > 0.1], 1.0, atol=1e-3)
    assert item["depth"].shape == (h, w, 1)
    assert item["env_gt"].shape == (ENV_RC[0], ENV_RC[1], 128, 3)
    assert float(item["env_ind"][0]) == 1.0
    # seg bands partition-ish the image
    s = item["seg_area"] + item["seg_env"] + item["seg_brdf"]
    assert 0.8 < float(s.mean()) <= 1.01

    it = BatchIterator(ds, 2, num_workers=1)
    b = next(iter(it))
    assert b["im"].shape == (2, h, w, 3)
    assert len(b["name"]) == 2


def test_packed_cache_matches_direct_loader(dataset, tmp_path):
    """The packed decode cache (data/cache.py) must reproduce the direct
    loader: bitwise for every LDR-derived field, depth, segs, and the
    exposure-scaled image; ~1 ulp for env_gt (the direct native decoder
    folds the exposure scale into the pool accumulation, the cache
    multiplies after).  Epoch advance must track the same (seed, epoch,
    item) augmentation stream."""
    from inverserenderingofindoorscene_tpu.data.cache import (
        CachedOpenRoomsDataset,
    )
    from inverserenderingofindoorscene_tpu.data.openrooms import (
        BatchIterator,
        OpenRoomsDataset,
    )

    def make(phase):
        return OpenRoomsDataset(
            dataset, im_hw=IM_HW, env_rc=ENV_RC, phase=phase,
            is_light=True, is_all_light=True, seed=5,
        )

    direct = make("TRAIN")
    cached = CachedOpenRoomsDataset(make("TRAIN"), str(tmp_path / "cache"))
    for epoch in (0, 1):
        direct.set_epoch(epoch)
        cached.set_epoch(epoch)
        for i in range(len(direct)):
            a, b = direct[i], cached[i]
            assert set(a) == set(b)
            for k in a:
                if k == "name":
                    assert a[k] == b[k]
                elif k == "env_gt":
                    np.testing.assert_allclose(
                        b[k], a[k], rtol=3e-6, atol=1e-7, err_msg=k
                    )
                else:
                    np.testing.assert_array_equal(b[k], a[k], err_msg=k)
    # epoch 1 actually differs from epoch 0 (the exposure stream advanced)
    cached.set_epoch(0)
    e0 = cached[0]["im"]
    cached.set_epoch(1)
    assert not np.array_equal(cached[0]["im"], e0)

    # a second construction reuses the completed cache (no rebuild)
    import time as _time

    t0 = _time.time()
    again = CachedOpenRoomsDataset(make("TRAIN"), str(tmp_path / "cache"))
    assert _time.time() - t0 < 2.0
    assert again.dir == cached.dir

    # TEST phase: deterministic exposure, same parity
    dtest = make("TEST")
    ctest = CachedOpenRoomsDataset(make("TEST"), str(tmp_path / "cache"))
    np.testing.assert_array_equal(ctest[0]["im"], dtest[0]["im"])

    # half-precision variant: separate cache dir, tolerance contract
    chalf = CachedOpenRoomsDataset(
        make("TRAIN"), str(tmp_path / "cache"), half=True
    )
    assert chalf.dir != cached.dir
    direct.set_epoch(0)
    chalf.set_epoch(0)
    a, b = direct[0], chalf[0]
    np.testing.assert_allclose(b["im"], a["im"], atol=2e-3)
    np.testing.assert_allclose(b["env_gt"], a["env_gt"], rtol=2e-3,
                               atol=1e-6)
    np.testing.assert_array_equal(b["albedo"], a["albedo"])

    # BatchIterator integration: identical batches vs a direct iterator,
    # in both thread and (picklable) process prefetch modes
    for mode in ("thread", "process"):
        it_d = BatchIterator(make("TRAIN"), 2, num_workers=2, seed=7,
                             mode="thread")
        it_c = BatchIterator(
            CachedOpenRoomsDataset(make("TRAIN"), str(tmp_path / "cache")),
            2, num_workers=2, seed=7, mode=mode,
        )
        try:
            for bd, bc in zip(it_d, it_c):
                assert bd["name"] == bc["name"]
                np.testing.assert_array_equal(bc["im"], bd["im"])
                np.testing.assert_allclose(bc["env_gt"], bd["env_gt"],
                                           rtol=3e-6, atol=1e-7)
        finally:
            it_c.close()


def test_build_cache_cli(dataset, tmp_path):
    """The cache-prebuild driver: builds both phases, is idempotent, and
    the train CLIs' lazy path reuses the prebuilt shards."""
    from inverserenderingofindoorscene_tpu.cli import build_cache
    from inverserenderingofindoorscene_tpu.data.cache import (
        CachedOpenRoomsDataset,
    )
    from inverserenderingofindoorscene_tpu.data.openrooms import (
        OpenRoomsDataset,
    )

    cache = str(tmp_path / "cache")
    argv = _args(dataset, ["--itemCache", cache, "--light"])
    build_cache.main(argv)
    dirs = set(os.listdir(cache))
    # this fixture lists the same scene in train.txt and test.txt, so
    # both phases share ONE shard dir (phase is deliberately not part of
    # the signature: the exposure rule applies at read, from the stored
    # pivot); disjoint real splits get one dir per phase
    assert len(dirs) == 1
    build_cache.main(argv)  # idempotent
    assert set(os.listdir(cache)) == dirs
    # the lazy path lands on one of the prebuilt shard dirs
    ds = OpenRoomsDataset(dataset, im_hw=IM_HW, env_rc=ENV_RC,
                          is_light=True, is_all_light=True)
    cached = CachedOpenRoomsDataset(ds, cache)
    assert osp.basename(cached.dir) in dirs


def test_cache_build_kill_resume(dataset, tmp_path):
    """A SIGKILLed cache build resumes from its durable chunk bitmap
    (data/cache.py _build: rows flushed before bits) instead of
    restarting from zero, meta.json only appears on completion, and the
    resumed cache is bitwise-identical to the direct loader."""
    import subprocess
    import sys
    import time

    # widen the tree to 12 items by hardlinking the fixture's files into
    # three more scenes (content-identical; the cache keys rows by path)
    root = str(tmp_path / "tree")
    src_scene = osp.join(dataset, "main_xml", "scene0001")
    os.makedirs(osp.join(root, "main_xml"), exist_ok=True)
    names = []
    for sidx in range(4):
        rel = "scene%04d" % sidx
        names.append(rel)
        dst = osp.join(root, "main_xml", rel)
        os.makedirs(dst, exist_ok=True)
        for f in os.listdir(src_scene):
            os.link(osp.join(src_scene, f), osp.join(dst, f))
    with open(osp.join(root, "train.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(osp.join(root, "test.txt"), "w") as f:
        f.write(names[0] + "\n")

    cache = str(tmp_path / "cache")
    prog = """
import sys
import time
from inverserenderingofindoorscene_tpu.data import cache as C
from inverserenderingofindoorscene_tpu.data.openrooms import OpenRoomsDataset
C.CachedOpenRoomsDataset._BUILD_CHUNK = 3
ds = OpenRoomsDataset(sys.argv[1], im_hw=(64, 64), env_rc=(32, 32),
                      is_light=True, is_all_light=True, seed=5)
orig = ds.load_raw
ds.load_raw = lambda i: (time.sleep(0.25), orig(i))[1]
C.CachedOpenRoomsDataset(ds, sys.argv[2], workers=1)
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.Popen([sys.executable, "-c", prog, root, cache], env=env)
    try:
        # wait for >=1 durable chunk, then SIGKILL mid-build (this exact
        # child pid only)
        bpath = None
        deadline = time.time() + 180
        while time.time() < deadline:
            if bpath is None and osp.isdir(cache):
                for d in os.listdir(cache):
                    q = osp.join(cache, d, "built.u8")
                    if osp.isfile(q):
                        bpath = q
            if bpath and osp.getsize(bpath) > 0:
                bits = np.fromfile(bpath, np.uint8)
                if 3 <= bits.sum() < len(bits):
                    break
            if p.poll() is not None:
                break
            time.sleep(0.05)
    finally:
        p.kill()
        p.wait()
    assert bpath is not None, "build never started"
    bits = np.fromfile(bpath, np.uint8)
    assert 0 < bits.sum() < 12, int(bits.sum())  # genuinely partial
    shard = osp.dirname(bpath)
    # incomplete build is not readable as a cache
    assert not osp.isfile(osp.join(shard, "meta.json"))

    from inverserenderingofindoorscene_tpu.data.cache import (
        CachedOpenRoomsDataset,
    )
    from inverserenderingofindoorscene_tpu.data.openrooms import (
        OpenRoomsDataset,
    )

    def make():
        return OpenRoomsDataset(root, im_hw=(64, 64), env_rc=(32, 32),
                                is_light=True, is_all_light=True, seed=5)

    # resume in-process: only the missing rows are decoded again
    calls = []
    ds2 = make()
    orig2 = ds2.load_raw
    ds2.load_raw = lambda i: (calls.append(i), orig2(i))[1]
    cached = CachedOpenRoomsDataset(ds2, cache)
    assert cached.dir == shard
    assert osp.isfile(osp.join(shard, "meta.json"))
    # row 0 is always re-read for array shapes; every durable row is
    # skipped, every missing row decoded exactly once
    assert set(calls) - {0} == set(np.flatnonzero(bits == 0)) - {0}, calls

    direct = make()
    for i in range(len(direct)):
        a, b = direct[i], cached[i]
        np.testing.assert_array_equal(b["im"], a["im"])
        np.testing.assert_array_equal(b["albedo"], a["albedo"])
        np.testing.assert_allclose(b["env_gt"], a["env_gt"], rtol=3e-6,
                                   atol=1e-7)


def test_batch_iterator_process_mode_matches_thread(dataset):
    """The spawned process-pool prefetch (the train CLIs' default for
    BRDF-stage loaders) must yield the SAME batches as the thread/serial
    modes: augmentations are keyed by (seed, epoch, item), not worker."""
    from inverserenderingofindoorscene_tpu.data.openrooms import (
        BatchIterator,
        OpenRoomsDataset,
    )

    ds = OpenRoomsDataset(dataset, im_hw=IM_HW, env_rc=ENV_RC)
    serial = list(BatchIterator(ds, 2, num_workers=1, seed=3))
    itp = BatchIterator(ds, 2, num_workers=2, seed=3, mode="process")
    try:
        proc = list(itp)
        assert len(proc) == len(serial) > 0
        for bs, bp in zip(serial, proc):
            assert bs["name"] == bp["name"]
            for k in bs:
                if k == "name":
                    continue
                np.testing.assert_array_equal(bp[k], bs[k], err_msg=k)
        # second epoch advances the augmentation stream identically
        s2 = list(BatchIterator(ds, 2, num_workers=1, seed=3,
                                mode="thread"))  # epoch 0 again
        p2 = list(itp)  # epoch 1
        assert not np.array_equal(p2[0]["im"], s2[0]["im"])
    finally:
        itp.close()


def test_train_brdf_cli(dataset, tmp_path):
    from inverserenderingofindoorscene_tpu.cli import train_brdf

    exp = str(tmp_path / "exp_brdf")
    train_brdf.main(_args(dataset, ["--experiment", exp]))
    assert osp.isdir(exp)
    from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt

    assert ckpt.latest_epoch(exp, "brdf", 0) == 0


def test_train_light_cli(dataset, tmp_path):
    from inverserenderingofindoorscene_tpu.cli import test_synthetic, train_light

    exp = str(tmp_path / "exp_light")
    train_light.main(
        _args(dataset, ["--experiment", exp, "--batchSize", "1",
                        "--maxSteps", "1", "--noPallas"])
    )
    from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt

    assert ckpt.latest_epoch(exp, "light", 0) == 0

    # held-out light evaluation loads the checkpoint just trained (the
    # cross-stage hand-off incl. the eval-offset/train-offset split)
    troot = str(tmp_path / "test_light")
    out = test_synthetic.main(
        _args(dataset, ["--stage", "light", "--lightExperiment", exp,
                        "--batchSize", "1", "--maxSteps", "1",
                        "--testRoot", troot])
    )
    for k in ("reconst", "render"):
        assert np.isfinite(out[k]), k
    # envmap mosaic + rendered-image artifacts (testLight.py:293-309)
    assert osp.isfile(osp.join(troot, "0_envmapPred.png"))
    assert osp.isfile(osp.join(troot, "0_imRendered.png"))


def test_train_bilateral_cli_auto_vmax(dataset, tmp_path):
    """Bilateral stage driver end-to-end with the per-batch exact
    auto-capacity dispatch (--vMax auto)."""
    from inverserenderingofindoorscene_tpu.cli import train_bilateral

    exp = str(tmp_path / "exp_bs")
    train_bilateral.main(
        _args(dataset, ["--experiment", exp, "--vMax", "auto"])
    )
    from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt

    assert ckpt.latest_epoch(exp, "bs", 0) == 0


def test_auto_dispatch_bump_on_edge_overflow(dataset):
    """The exactness guarantee of the auto-capacity dispatch: a batch
    whose edge count overflows the current bucket must be re-run at a
    bumped capacity, and the ACCEPTED step must match a fresh run at an
    ample capacity exactly (the overflowed run's state is discarded)."""
    import jax

    from inverserenderingofindoorscene_tpu.cli.train_bilateral import (
        _auto_vmax_dispatch,
        parse_args,
    )
    from inverserenderingofindoorscene_tpu.data.synthetic import (
        synthetic_batch,
    )
    from inverserenderingofindoorscene_tpu.ops.bilateral import edge_bucket
    from inverserenderingofindoorscene_tpu.pipeline.bilateral import (
        BilateralNets,
    )
    from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
    from inverserenderingofindoorscene_tpu.train.steps import (
        create_train_state,
        make_bilateral_train_step,
        reference_adam,
    )

    # 48x64: large enough that a smooth guide's link count exceeds the
    # 1024-minimum edge bucket the noise batch tightens to
    im_hw = (48, 64)
    opt = parse_args(["--dataRoot", dataset, "--imHeight", str(im_hw[0]),
                      "--imWidth", str(im_hw[1])])
    brdf_nets = BRDFNets(cascade_level=0)
    bs_nets_init = BilateralNets()
    bp = brdf_nets.init(jax.random.PRNGKey(0), im_hw)
    sp = bs_nets_init.init(jax.random.PRNGKey(1), im_hw)

    calls = []  # one entry per step EXECUTION: (v_max, e_max)

    def jit_step(nets, donate=True):
        inner = jax.jit(make_bilateral_train_step(brdf_nets, nets, bp))

        def wrapped(state, batch):
            calls.append((nets.v_max, nets.e_max))
            return inner(state, batch)

        return wrapped

    step_fn = _auto_vmax_dispatch(opt, brdf_nets, bp, jit_step)

    # batch 1: random noise -> almost no edges; the accepted run
    # tightens the edge bucket to the observed-count minimum
    b1 = synthetic_batch(batch=1, im_hw=im_hw, env_rc=(16, 16), seed=0)
    state = create_train_state(sp, reference_adam(1e-4))
    state, m1 = step_fn(state, b1)
    assert int(m1["nedges_max"]) <= calls[-1][1]

    # batch 2: a smooth image -> many real grid links; force an
    # overflow of the tightened bucket and verify the bump + exactness
    yy, xx = np.mgrid[0:im_hw[0], 0:im_hw[1]]
    smooth = np.stack([xx / im_hw[1], yy / im_hw[0],
                       0.5 + 0.4 * np.sin(xx / 3.0)], -1)
    b2 = dict(b1)
    b2["im"] = jax.numpy.asarray(
        np.clip(smooth + np.random.RandomState(1).randn(*smooth.shape)
                * 0.01, 0, 1)[None],
        b1["im"].dtype,
    )
    n_before = len(calls)
    state2, m2 = step_fn(state, b2)
    nedges2 = int(m2["nedges_max"])
    batch2_calls = calls[n_before:]
    # the overflow path must actually fire: first attempt at the bucket
    # tightened by batch 1, then the bumped re-run that gets accepted
    assert len(batch2_calls) >= 2, (batch2_calls, nedges2)
    assert nedges2 > batch2_calls[0][1], (batch2_calls, nedges2)
    assert nedges2 <= batch2_calls[-1][1], (batch2_calls, nedges2)

    # the accepted result equals a fresh ample-capacity run bit-for-bit
    # in its losses (the discarded overflow run must not leak into state)
    ample = jax.jit(make_bilateral_train_step(
        brdf_nets,
        BilateralNets(v_max=im_hw[0] * im_hw[1],
                      e_max=edge_bucket(nedges2, im_hw[0] * im_hw[1])),
        bp,
    ))
    _, m_ref = ample(state, b2)
    for k in ("albedo_bs", "rough_bs", "depth_bs", "total"):
        np.testing.assert_allclose(float(m2[k]), float(m_ref[k]),
                                   rtol=1e-5, err_msg=k)


def test_output_and_cascade1_roundtrip(dataset, tmp_path):
    """Export cascade-0 intermediates, then load them as a cascade-1 batch."""
    from inverserenderingofindoorscene_tpu.cli import output_brdf_light
    from inverserenderingofindoorscene_tpu.data.openrooms import OpenRoomsDataset

    output_brdf_light.main(
        _args(dataset, ["--batchSize", "1", "--maxSteps", str(NIMG)])
    )
    ds = OpenRoomsDataset(
        dataset, im_hw=IM_HW, env_rc=ENV_RC, cascade_level=1,
        is_light=True, is_all_light=True,
    )
    assert len(ds) > 0
    item = ds[0]
    for k in ("albedo_pre", "normal_pre", "rough_pre", "depth_pre",
              "diffuse_pre", "specular_pre", "env_pre"):
        assert k in item, k
    assert item["env_pre"].shape == (ENV_RC[0], ENV_RC[1], 84)
    assert item["albedo_pre"].shape[2] == 3


def test_test_synthetic_cli(dataset, tmp_path):
    from inverserenderingofindoorscene_tpu.cli import test_synthetic

    troot = str(tmp_path / "test_brdf")
    out = test_synthetic.main(
        _args(dataset, ["--stage", "brdf", "--testRoot", troot])
    )
    for k in ("albedo", "normal", "rough", "depth"):
        assert np.isfinite(out[k]), k
    # the reference test-driver artifact family (testBRDF.py:128,257-316):
    # per-iteration testingLog, per-key error .npy, pred/GT image grids
    logs = [f for f in os.listdir(troot) if f.startswith("testingLog_")]
    assert logs, os.listdir(troot)
    text = open(osp.join(troot, logs[0])).read()
    assert "albedo:" in text and "albedoAccu:" in text
    epoch = logs[0].split("_")[1].split(".")[0]
    for k in ("albedo", "normal", "rough", "depth"):
        arr = np.load(osp.join(troot, f"{k}Error_{epoch}.npy"))
        # one row per test iteration (the 3-image fixture gives one
        # full batch at batchSize=2)
        assert arr.ndim == 2 and np.all(np.isfinite(arr)), (k, arr)
    for name in ("im", "albedoGt_0", "albedoPred_0", "depthPred_0"):
        assert osp.isfile(osp.join(troot, f"0_{name}.png")), name


def test_test_real_cli(dataset, tmp_path):
    cv2 = pytest.importorskip("cv2")
    from inverserenderingofindoorscene_tpu.cli import test_real

    rng = np.random.RandomState(1)
    png = tmp_path / "real.png"
    # square: keeps the aspect-scaled lighting grid at the full 32x32 (a
    # smaller grid would collapse in the 6-level light encoder)
    cv2.imwrite(str(png), (rng.rand(64, 64, 3) * 255).astype(np.uint8))
    im_list = tmp_path / "list.txt"
    im_list.write_text(str(png) + "\n")
    outdir = tmp_path / "out"
    test_real.main([
        "--imList", str(im_list), "--output", str(outdir),
        "--level", "2", "--isLight", "--isBS",
        "--imHeight", str(IM_HW[0]), "--imWidth", str(IM_HW[1]),
        "--envRow", str(ENV_RC[0]), "--envCol", str(ENV_RC[1]),
    ])
    files = os.listdir(outdir)
    # per-level products for BOTH cascade levels (testReal.py:542-660
    # loops every product list over the levels, incl. per-level BS);
    # BS products carry the reference's runtime 'BS' capitalization
    # (the names CompareWHDR.py:72/CompareDepth.py:10 glob for) and the
    # SG params use the reference's envmapSG name
    for lvl in (0, 1):
        for prod in (f"albedo{lvl}.npy", f"envmap{lvl}.png",
                     f"envmap{lvl}.npz", f"envmapSG{lvl}.npy",
                     f"albedoBS{lvl}.png", f"albedoBS{lvl}.npy",
                     f"roughBS{lvl}.png", f"depthBS{lvl}.npy",
                     f"cLight{lvl}.npy"):
            assert any(prod in f for f in files), (prod, files)
    # the input photo itself is a product (testReal.py:659-660), at its
    # ORIGINAL unresized resolution
    assert osp.isfile(osp.join(outdir, "real.png"))
    im_prod = cv2.imread(osp.join(outdir, "real.png"))
    assert im_prod.shape[:2] == (64, 64)
    # SG npy in the reference's CHW layout [1, SGNum*7, R, C]
    sg = np.load(outdir / "real_envmapSG1.npy")
    assert sg.shape == (1, 84, ENV_RC[0], ENV_RC[1]), sg.shape
    # npz: reference key/layout [R, C, eh, ew, 3]
    env = np.load(outdir / "real_envmap1.npz")["env"]
    assert env.shape == (ENV_RC[0], ENV_RC[1], 8, 16, 3), env.shape

    # the fused-kernel inference branch (interpret-mode on CPU): same
    # run configuration, envmaps numerically matching the jnp path.
    # Normalizing by the mean cancels the cLight global scale, whose
    # data-dependent branch could flip on tiny numeric differences.
    outdir2 = tmp_path / "out_pallas"
    test_real.main([
        "--imList", str(im_list), "--output", str(outdir2),
        "--level", "2", "--isLight", "--usePallas",
        "--imHeight", str(IM_HW[0]), "--imWidth", str(IM_HW[1]),
        "--envRow", str(ENV_RC[0]), "--envCol", str(ENV_RC[1]),
    ])
    env_jnp = np.load(outdir / "real_envmap1.npz")["env"]
    env_pal = np.load(outdir2 / "real_envmap1.npz")["env"]
    assert env_pal.shape == env_jnp.shape
    np.testing.assert_allclose(
        env_pal / env_pal.mean(), env_jnp / env_jnp.mean(), atol=1e-3
    )

    # the whole-chain single-program branch (--fused): same products as
    # the staged run up to the f32-vs-host-f64 cLight arithmetic
    outdir3 = tmp_path / "out_fused"
    test_real.main([
        "--imList", str(im_list), "--output", str(outdir3),
        "--level", "2", "--isLight", "--fused",
        "--imHeight", str(IM_HW[0]), "--imWidth", str(IM_HW[1]),
        "--envRow", str(ENV_RC[0]), "--envCol", str(ENV_RC[1]),
    ])
    alb_staged = np.load(outdir / "real_albedo1.npy")
    alb_fused = np.load(outdir3 / "real_albedo1.npy")
    np.testing.assert_allclose(alb_fused, alb_staged, rtol=1e-3, atol=1e-5)


def test_test_real_native_resolution_products(tmp_path):
    """Product-shape parity with testReal.py:543-660: PNG/normal-npy
    products come out at the photo's aspect-FITTED network size (nw, nh)
    — not a fixed im_hw — depth npys stay at network resolution, and the
    input photo is re-written at its ORIGINAL resolution."""
    cv2 = pytest.importorskip("cv2")
    from inverserenderingofindoorscene_tpu.cli import test_real

    rng = np.random.RandomState(2)
    png = tmp_path / "wide.png"
    # landscape 80x128 photo; im_hw (64,64) -> fitted (40, 64)
    cv2.imwrite(str(png), (rng.rand(80, 128, 3) * 255).astype(np.uint8))
    im_list = tmp_path / "list.txt"
    im_list.write_text(str(png) + "\n")
    outdir = tmp_path / "out"
    # BRDF-only level-1 run: aspect handling without the light encoder's
    # minimum-grid constraint
    test_real.main([
        "--imList", str(im_list), "--output", str(outdir),
        "--level", "1",
        "--imHeight", str(IM_HW[0]), "--imWidth", str(IM_HW[1]),
        "--envRow", str(ENV_RC[0]), "--envCol", str(ENV_RC[1]),
    ])
    fitted = (40, 64)
    for prod in ("albedo0", "normal0", "rough0", "depth0"):
        im = cv2.imread(str(outdir / f"wide_{prod}.png"))
        assert im is not None and im.shape[:2] == fitted, (prod, im.shape)
    # normal npy: saved RESIZED (testReal.py:565); depth npy: network res
    assert np.load(outdir / "wide_normal0.npy").shape[:2] == fitted
    assert np.load(outdir / "wide_depth0.npy").shape[:2] == fitted
    # the re-written input photo keeps its original resolution
    orig = cv2.imread(str(outdir / "wide.png"))
    assert orig.shape[:2] == (80, 128)


def test_preemption_resume_bitwise(dataset, tmp_path, monkeypatch):
    """Preemption-grade checkpointing: a run killed mid-epoch (after a
    --ckptEverySteps step checkpoint) and resumed with --resume auto
    must land on the SAME final state BITWISE as an uninterrupted run —
    the restored opt_state carries the LR schedule and the skipped
    batch prefix reproduces the data position (the loaders' streams are
    (seed, epoch, item)-keyed)."""
    from inverserenderingofindoorscene_tpu.cli import train_brdf
    from inverserenderingofindoorscene_tpu.utils import checkpoint as ckpt
    from inverserenderingofindoorscene_tpu.utils.logging import MetricLogger

    def run_args(exp):
        # batchSize 1 -> 3 steps/epoch on the 3-image fixture.
        # logFlushSteps 1: this test uses the per-step MetricLogger.log
        # call as its kill hook, so logging must not be buffered
        return _args(dataset, [
            "--experiment", exp, "--batchSize", "1", "--maxSteps", "100",
            "--ckptEverySteps", "1", "--resume", "auto",
            "--logFlushSteps", "1",
        ])

    # --- run A: uninterrupted 1-epoch run ---
    exp_a = str(tmp_path / "exp_a")
    train_brdf.main(run_args(exp_a))

    # --- run B: killed after step 2's checkpoint, then resumed ---
    exp_b = str(tmp_path / "exp_b")
    orig_log = MetricLogger.log
    calls = {"n": 0}

    def bomb(self, epoch, j, metrics):
        orig_log(self, epoch, j, metrics)
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt  # simulated preemption

    monkeypatch.setattr(MetricLogger, "log", bomb)
    with pytest.raises(KeyboardInterrupt):
        train_brdf.main(run_args(exp_b))
    monkeypatch.setattr(MetricLogger, "log", orig_log)

    # the kill happened between logger.log and the step-1 save: the
    # newest step checkpoint is (0, 0); no epoch checkpoint exists yet
    assert ckpt.latest_epoch(exp_b, "brdf", 0) is None
    assert ckpt.list_step_checkpoints(exp_b, "brdf", 0)[-1] == (0, 0)

    train_brdf.main(run_args(exp_b))  # resume: runs steps 1 and 2

    # --- the two epoch-0 checkpoints must be bitwise identical ---
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree_a = ckptr.restore(osp.abspath(osp.join(exp_a, "brdf0_0")))
    tree_b = ckptr.restore(osp.abspath(osp.join(exp_b, "brdf0_0")))
    la = jax.tree_util.tree_leaves_with_path(tree_a)
    lb = jax.tree_util.tree_leaves_with_path(tree_b)
    assert len(la) == len(lb) > 0
    for (pa, va), (pb, vb) in zip(la, lb):
        assert pa == pb
        np.testing.assert_array_equal(va, vb, err_msg=str(pa))

    # step checkpoints were pruned to --ckptKeep (default 2)
    assert len(ckpt.list_step_checkpoints(exp_b, "brdf", 0)) <= 2
