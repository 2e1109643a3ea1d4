"""IIW / NYU dataset loaders over generated on-disk fixtures."""

import json
import os

import numpy as np
import pytest

from inverserenderingofindoorscene_tpu.data.iiw import IIWDataset, ZipDataset
from inverserenderingofindoorscene_tpu.data.nyu import NYUDataset

H, W = 48, 64


@pytest.fixture(scope="module")
def iiw_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("iiw")
    rng = np.random.RandomState(0)
    names = []
    for i in range(2):
        name = f"img{i}.png"
        Image.fromarray(
            (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        ).save(root / name)
        judgements = {
            "intrinsic_points": [
                {"id": 1, "x": 0.2, "y": 0.2, "opaque": True},
                {"id": 2, "x": 0.8, "y": 0.8, "opaque": True},
                {"id": 3, "x": 0.5, "y": 0.5, "opaque": False},
            ],
            "intrinsic_comparisons": [
                {"point1": 1, "point2": 2, "darker": "E", "darker_score": 1.0},
                {"point1": 1, "point2": 2, "darker": "1", "darker_score": 0.5},
                {"point1": 1, "point2": 2, "darker": "2", "darker_score": 0.7},
                {"point1": 1, "point2": 3, "darker": "1", "darker_score": 1.0},
                {"point1": 1, "point2": 2, "darker": "0", "darker_score": 1.0},
            ],
        }
        with open(root / name.replace(".png", ".json"), "w") as f:
            json.dump(judgements, f)
        names.append(name)
    (root / "list.txt").write_text("\n".join(names) + "\n")
    return str(root)


def test_iiw_loader(iiw_root):
    ds = IIWDataset(iiw_root, os.path.join(iiw_root, "list.txt"),
                    im_hw=(H, W), max_num=10, seed=0)
    assert len(ds) == 2
    item = ds[0]
    assert item["im"].shape == (H, W, 3)
    assert 0 <= item["im"].min() and item["im"].max() <= 1.0
    assert item["eq_point"].shape == (10, 4)
    assert item["eq_weight"].shape == (10,)
    # 1 eq pair + leading dummy row; opaque=False and darker='0' rows dropped
    assert int(item["eq_num"]) == 2
    assert int(item["darker_num"]) == 3  # dummy + '1' + '2'
    # points inside the crop
    assert item["eq_point"].min() >= 0
    assert item["eq_point"][:, [0, 2]].max() < H
    assert item["eq_point"][:, [1, 3]].max() < W
    # darker convention: weights nonzero rows have valid indices
    nz = item["darker_weight"] > 0
    assert nz.sum() == 2


def test_zip_dataset(iiw_root):
    ds = IIWDataset(iiw_root, os.path.join(iiw_root, "list.txt"),
                    im_hw=(H, W), max_num=10)

    class Fake:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return i

    z = ZipDataset(Fake(), ds)
    assert len(z) == 5
    a, b = z[3]
    assert a == 3
    assert b["im"].shape == (H, W, 3)


@pytest.fixture(scope="module")
def nyu_root(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    base = tmp_path_factory.mktemp("nyu")
    rng = np.random.RandomState(1)
    for sub in ("images", "normals", "depths", "segs"):
        os.makedirs(base / sub, exist_ok=True)
    names = []
    for i in range(2):
        name = f"frame{i}.png"
        cv2.imwrite(str(base / "images" / name),
                    (rng.rand(480, 640, 3) * 255).astype(np.uint8))
        n = rng.uniform(-1, 1, (480, 640, 3))
        n[..., 2] = np.abs(n[..., 2]) + 0.3
        n /= np.linalg.norm(n, axis=2, keepdims=True)
        cv2.imwrite(str(base / "normals" / name),
                    ((n * 0.5 + 0.5) * 255).astype(np.uint8))
        cv2.imwrite(str(base / "segs" / name),
                    np.full((480, 640, 3), 255, np.uint8))
        depth = (rng.rand(480, 640) * 8 + 0.5).astype(np.float32)
        cv2.imwrite(str(base / "depths" / name.replace(".png", ".tiff")),
                    depth)
        names.append(name)
    (base / "list.txt").write_text("\n".join(names) + "\n")
    return str(base)


def test_nyu_loader(nyu_root):
    import os.path as osp

    ds = NYUDataset(
        osp.join(nyu_root, "images"),
        osp.join(nyu_root, "normals"),
        osp.join(nyu_root, "depths"),
        osp.join(nyu_root, "segs"),
        osp.join(nyu_root, "list.txt"),
        im_hw=(H, W),
        seed=0,
    )
    assert len(ds) == 2
    item = ds[0]
    assert item["im"].shape == (H, W, 3)
    assert item["normal"].shape == (H, W, 3)
    norms = np.linalg.norm(item["normal"], axis=2)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert item["depth"].shape == (H, W, 1)
    assert item["seg_depth"].shape == (H, W, 1)
    assert set(np.unique(item["seg_depth"])) <= {0.0, 1.0}
    # TEST phase: deterministic full-frame crop
    ds_test = NYUDataset(
        osp.join(nyu_root, "images"),
        osp.join(nyu_root, "normals"),
        osp.join(nyu_root, "depths"),
        osp.join(nyu_root, "segs"),
        osp.join(nyu_root, "list.txt"),
        im_hw=(H, W),
        phase="TEST",
    )
    a = ds_test[0]["im"]
    b = ds_test[0]["im"]
    np.testing.assert_array_equal(a, b)


def test_iiw_fixture_format(tmp_path):
    """write_iiw_fixture emits the IIW on-disk layout
    (iiwDataLoader.py:25-232): loadable through IIWDataset with live
    point pairs, and its judgements obey the WHDR delta=0.1 rule
    against the image's own GT-consistent reflectance ordering."""
    import json as _json

    pytest.importorskip("cv2")
    from inverserenderingofindoorscene_tpu.data.fixture import (
        write_iiw_fixture,
    )

    root = str(tmp_path / "iiw")
    write_iiw_fixture(root, n_train=2, n_test=1, frame_hw=(96, 128),
                      n_pairs=20)
    # idempotent (marker)
    write_iiw_fixture(root, n_train=2, n_test=1, frame_hw=(96, 128),
                      n_pairs=20)
    names = open(os.path.join(root, "IIWTrain.txt")).read().split()
    assert len(names) == 2
    ds = IIWDataset(root, os.path.join(root, "IIWTrain.txt"),
                    im_hw=(48, 64), max_num=30, seed=0)
    item = ds[0]
    assert item["im"].shape == (48, 64, 3)
    # all 20 pairs are opaque with weight 1: dummy row + survivors
    assert int(item["eq_num"]) + int(item["darker_num"]) == 22
    with open(os.path.join(root, names[0].replace(".png", ".json"))) as f:
        j = _json.load(f)
    assert len(j["intrinsic_comparisons"]) == 20
    assert {c["darker"] for c in j["intrinsic_comparisons"]} <= {"1", "2", "E"}
