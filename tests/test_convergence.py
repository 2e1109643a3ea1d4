"""From-scratch convergence gate (VERDICT r3 #1).

The reference's entire reason to exist is that running its training
drivers for epochs produces working models
(/root/reference/trainBRDF.py:145-396, README.md:27-34).  This gate
trains each stage FROM SCRATCH through the real CLIs on the
physically-consistent procedural fixture (data/fixture.py: images
rendered from their GT fields with the f64 SG oracle) and asserts that

  * the train loss falls by a large factor over the run,
  * held-out TEST-split metrics IMPROVE over the untrained init
    (same seed => the eval'd init checkpoint is the run's exact step-0
    state),

i.e. the framework actually learns the inverse map — not just that
steps execute.  The full-scale recorded run (420/300/150 steps on the
real chip, BASELINE.md "Convergence" section) uses the same harness
via scripts/run_convergence.py.
"""

import json
import os.path as osp
import sys

import pytest

sys.path.insert(
    0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "scripts")
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def summary(tmp_path_factory):
    import run_convergence

    out = str(tmp_path_factory.mktemp("conv"))
    # ~128 brdf / ~48 light / ~16 bilateral steps: small enough for the
    # CPU suite, large enough that convergence (not noise) decides.
    return run_convergence.main([
        "--out", out,
        "--imHeight", "64", "--imWidth", "64",
        "--envRow", "32", "--envCol", "32",
        "--scenes", "2", "--perScene", "8",
        "--brdfEpochs", "32", "--brdfBatch", "4",
        "--lightEpochs", "3", "--lightBatch", "1",
        "--bsEpochs", "2", "--bsBatch", "2",
        "--finetuneIIW", "--iiwEpochs", "2", "--iiwBatch", "2",
    ])


def test_brdf_converges(summary):
    rec = summary["stages"]["brdf"]
    # a multi-epoch from-scratch run: total loss falls >= 5x ...
    assert rec["loss"]["steps"] >= 100
    assert rec["loss"]["ratio"] >= 5.0, rec["loss"]
    # ... and the held-out metrics of the strongly-observable heads
    # improve materially over init (calibration run: albedo 9.2x,
    # normal 7.7x).  rough/depth are only weakly observable in a
    # 16-image fixture (roughness enters the image through specular
    # highlights alone) and drift +-10%; gate them against blow-up only.
    imp = rec["test_improvement"]
    assert imp["albedo"] >= 3.0, rec
    assert imp["normal"] >= 3.0, rec
    for k in ("rough", "depth"):
        assert rec["trained_test"][k] <= rec["init_test"][k] * 1.25, (k, rec)


def test_light_converges(summary):
    rec = summary["stages"]["light"]
    # the 10*reconst + render loss falls and BOTH held-out light metrics
    # improve (calibration run: loss 1.33x, reconst 1.16x, render 1.99x)
    assert rec["loss"]["ratio"] >= 1.2, rec["loss"]
    assert rec["trained_test"]["reconst"] < rec["init_test"]["reconst"], rec
    assert rec["trained_test"]["render"] < rec["init_test"]["render"], rec


def test_bilateral_converges(summary):
    rec = summary["stages"]["bilateral"]
    # the confidence CNN's refinement loss falls; the refined held-out
    # metrics do not regress vs the untrained refiner.  NB the loss is
    # floor-limited by the frozen BRDF's quality (on the chip run's
    # 420-step BRDF the refinement is already AT its floor and the ratio
    # is ~1.0 — BASELINE.md); this gate's 128-step BRDF leaves signal
    # (calibration: 1.16x) and the CPU run is deterministic.
    assert rec["loss"]["ratio"] >= 1.05, rec["loss"]
    for k in ("albedo_bs", "rough_bs", "depth_bs"):
        assert rec["trained_test"][k] <= rec["init_test"][k] * 1.02, (k, rec)


def test_iiw_finetune_improves_whdr(summary):
    rec = summary["stages"]["finetune_iiw"]
    # the ranking loss fine-tune (trainFineTuneIIW.py flow) lowers
    # held-out WHDR materially over the un-finetuned BRDF (calibration
    # run: 0.698 -> 0.517, 1.35x, after 2 epochs at 64x64)
    assert rec["trained_test"]["whdr"] <= rec["init_test"]["whdr"] * 0.9, rec


def test_summary_recorded(summary, tmp_path_factory):
    out = summary["config"]["out"]
    with open(osp.join(out, "summary.json")) as f:
        on_disk = json.load(f)
    assert set(on_disk["stages"]) == {
        "brdf", "light", "bilateral", "finetune_iiw"
    }
