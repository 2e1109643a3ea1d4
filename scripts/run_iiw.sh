#!/bin/bash
# IIW fine-tune + WHDR evaluation pipeline (the runIIW.sh equivalent; the
# reference's runIIW.sh is an accidental copy of runNYU.sh — this follows
# the intended flow of README.md:46-49 / CompareWHDR.py:70-72).
set -e
DATA_ROOT=${1:?usage: run_iiw.sh <openrooms_root> <iiw_root>}
IIW_ROOT=${2:?usage: run_iiw.sh <openrooms_root> <iiw_root>}

# cascade 0: fine-tune on IIW judgements
python -m inverserenderingofindoorscene_tpu.cli.train_finetune_iiw \
    --dataRoot "$DATA_ROOT" --iiwRoot "$IIW_ROOT" --cascadeLevel 0
# export cascade-0 intermediates, then cascade 1
python -m inverserenderingofindoorscene_tpu.cli.output_brdf_light \
    --dataRoot "$DATA_ROOT" --cascadeLevel 0
python -m inverserenderingofindoorscene_tpu.cli.train_finetune_iiw \
    --dataRoot "$DATA_ROOT" --iiwRoot "$IIW_ROOT" --cascadeLevel 1
# inference over the IIW test list + WHDR
python -m inverserenderingofindoorscene_tpu.cli.test_real \
    --imList IIWTest.txt --output IIW_results --level 2
python - <<'PY'
import glob, json
import numpy as np
from inverserenderingofindoorscene_tpu.eval.metrics import compute_whdr
total, cnt = 0.0, 0
for albedo_npy in glob.glob('IIW_results/*_albedo1.npy'):
    judgement = albedo_npy.replace('_albedo1.npy', '.json')
    refl = np.load(albedo_npy)
    with open(judgement) as f:
        res = compute_whdr(refl, json.load(f))
    if res:
        total += res[0]; cnt += 1
print('WHDR:', total / max(cnt, 1))
PY
