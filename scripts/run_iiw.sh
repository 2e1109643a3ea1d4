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
# inference over the IIW test list (paths under $IIW_ROOT) + WHDR.
# IIWTest.txt is the published split list shipped with the reference repo
# (/root/reference/IIWTest.txt) / the IIW release - a dataset artifact,
# expected in the working directory or substituted with your own split.
sed "s|^|$IIW_ROOT/|" IIWTest.txt > /tmp/iiw_test_paths.txt
python -m inverserenderingofindoorscene_tpu.cli.test_real \
    --imList /tmp/iiw_test_paths.txt --output IIW_results --level 2
python -m inverserenderingofindoorscene_tpu.cli.compare whdr \
    --predRoot IIW_results --gtRoot "$IIW_ROOT" --level 1
