#!/bin/bash
# NYU fine-tune + normal/depth evaluation (the runNYU.sh equivalent).
set -e
DATA_ROOT=${1:?usage: run_nyu.sh <openrooms_root> <nyu_root>}
NYU_ROOT=${2:?usage: run_nyu.sh <openrooms_root> <nyu_root>}

python -m inverserenderingofindoorscene_tpu.cli.train_finetune_nyu \
    --dataRoot "$DATA_ROOT" --nyuImRoot "$NYU_ROOT/images" \
    --nyuNormalRoot "$NYU_ROOT/normals" --nyuDepthRoot "$NYU_ROOT/depths" \
    --nyuSegRoot "$NYU_ROOT/segs" --cascadeLevel 0
python -m inverserenderingofindoorscene_tpu.cli.output_brdf_light \
    --dataRoot "$DATA_ROOT" --cascadeLevel 0
python -m inverserenderingofindoorscene_tpu.cli.train_finetune_nyu \
    --dataRoot "$DATA_ROOT" --nyuImRoot "$NYU_ROOT/images" \
    --nyuNormalRoot "$NYU_ROOT/normals" --nyuDepthRoot "$NYU_ROOT/depths" \
    --nyuSegRoot "$NYU_ROOT/segs" --cascadeLevel 1
python -m inverserenderingofindoorscene_tpu.cli.test_real \
    --imList NYUTest.txt --output NYU_results --level 2
# metrics: eval/metrics.normal_angle_error + si_log_depth_rmse over outputs
