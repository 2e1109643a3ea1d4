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


def test_metric_logger_buffered_matches_immediate(tmp_path):
    """MetricLogger.log_device with flush batching writes the SAME lines,
    history, and curves as per-step log() — only the device->host pull
    cadence differs (one stacked [N, K] transfer per flush_steps)."""
    import jax.numpy as jnp
    import numpy as np

    from inverserenderingofindoorscene_tpu.utils.logging import MetricLogger

    a = MetricLogger(str(tmp_path / "a.txt"), flush_steps=1)
    b = MetricLogger(str(tmp_path / "b.txt"), flush_steps=4)
    for j in range(10):  # 10 % 4 != 0: close() must flush the tail
        m = {"total": jnp.float32(1.0 / (j + 1)), "albedo": jnp.float32(j)}
        a.log(0, j, {k: float(v) for k, v in m.items()})
        b.log_device(0, j, m)
    assert len(b.history.get("total", [])) == 8  # two flushes so far
    a.save_curves(str(tmp_path), 0)
    b.close()
    assert b.history == a.history
    b.save_curves(str(tmp_path / "."), 0)
    lines_a = open(tmp_path / "a.txt").read()
    lines_b = open(tmp_path / "b.txt").read()
    assert lines_a == lines_b
    np.testing.assert_array_equal(
        np.load(tmp_path / "totalError_0.npy"),
        np.array(a.history["total"]),
    )


def test_watchdog_restarts_stalled_child_and_completes(tmp_path):
    """scripts/watchdog.py: a child doing zero io for --stall-secs is
    killed and relaunched (the axon tunnel's silent zero-io wedge); a
    child that exits 0 ends the loop.  The fake child sleeps forever on
    its first launch (no io) and succeeds on the second, keyed by a
    marker file."""
    import subprocess
    import sys

    marker = tmp_path / "ran_once"
    child = tmp_path / "child.py"
    child.write_text(
        "import os, sys, time\n"
        f"m = {str(marker)!r}\n"
        "if os.path.exists(m):\n"
        "    print('second run ok')\n"
        "    sys.exit(0)\n"
        "open(m, 'w').write('x')\n"
        "while True:\n"
        "    time.sleep(3600)\n"
    )
    r = subprocess.run(
        [sys.executable, "scripts/watchdog.py",
         "--stall-secs", "3", "--poll-secs", "1", "--settle-secs", "0",
         "--max-restarts", "2", "--",
         sys.executable, "-u", str(child)],
        cwd=osp.dirname(osp.dirname(osp.abspath(__file__))),
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "io stalled" in r.stdout and "killing" in r.stdout
    assert "completed cleanly" in r.stdout


def test_watchdog_gives_up_after_max_restarts(tmp_path):
    import subprocess
    import sys

    child = tmp_path / "fail.py"
    child.write_text("import sys; sys.exit(3)\n")
    r = subprocess.run(
        [sys.executable, "scripts/watchdog.py",
         "--stall-secs", "5", "--poll-secs", "1", "--settle-secs", "0",
         "--max-restarts", "1", "--",
         sys.executable, str(child)],
        cwd=osp.dirname(osp.dirname(osp.abspath(__file__))),
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 1
    assert r.stdout.count("launch attempt") == 2
    assert "gave up" in r.stdout


def test_load_frozen_cascade0_hard_fails_without_c0_checkpoints(tmp_path):
    """A typo'd/absent --brdf0Experiment at cascadeLevel 1 must raise,
    not silently synthesize *_pre from random frozen nets (the loaders'
    fallback is a print; the reference crashes on a missing checkpoint,
    trainFineTuneIIW_cascade1.py:117-160)."""
    import jax
    import pytest

    class Opt:
        cascadeLevel = 1
        imHeight, imWidth = 64, 64
        envRow = envCol = 32
        envHeight, envWidth = 8, 16
        SGNum = 12
        seed = 0
        offset = 1.0
        brdfExperiment = None
        brdfEpoch = None
        brdf0Experiment = str(tmp_path / "no_such_brdf0")
        brdf0Epoch = None
        light0Experiment = str(tmp_path / "no_such_light0")
        light0Epoch = None

    with pytest.raises(FileNotFoundError, match="cascade-0 BRDF"):
        common.load_frozen_cascade0(Opt(), jax.random.PRNGKey(0))
