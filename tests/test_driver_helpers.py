"""Driver plumbing helpers: epoch pairing, experiment naming, snapshots."""

import os.path as osp

from inverserenderingofindoorscene_tpu.cli import common


class FakeLoader:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        return iter(self.items)


def test_zip_max_cycle_wraps_shorter():
    a = FakeLoader([1, 2, 3, 4, 5])
    b = FakeLoader(["x", "y"])
    pairs, n = common.zip_max_cycle(a, b)
    pairs = list(pairs)
    assert n == 5 and len(pairs) == 5
    assert [p[0] for p in pairs] == [1, 2, 3, 4, 5]
    assert [p[1] for p in pairs] == ["x", "y", "x", "y", "x"]


def test_experiment_dir_naming_and_snapshot(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    class Opt:
        experiment = None
        cascadeLevel = 1
        imWidth, imHeight = 320, 240
        SGNum = 12
        offset = 1.0

    exp = common.experiment_dir(Opt(), "brdf")
    assert exp == "check_cascade1_w320_h240"
    assert osp.isdir(exp)
    # reproducibility: the package source was snapshotted
    assert osp.isdir(osp.join(exp, "src_snapshot"))

    exp = common.experiment_dir(Opt(), "light")
    assert exp == "check_cascadeLight1_sg12_offset1.0"
    exp = common.experiment_dir(Opt(), "bs")
    assert exp == "checkBs_cascade1_w320_h240"
