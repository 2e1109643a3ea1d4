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
# inference over the NYU test list (paths under $NYU_ROOT/images) + metrics.
# NYUTest.txt is the published split list shipped with the reference repo
# (/root/reference/NYUTest.txt) - a dataset artifact, expected in the
# working directory or substituted with your own split.
sed "s|^|$NYU_ROOT/images/|" NYUTest.txt > /tmp/nyu_test_paths.txt
python -m inverserenderingofindoorscene_tpu.cli.test_real \
    --imList /tmp/nyu_test_paths.txt --output NYU_results --level 2
python -m inverserenderingofindoorscene_tpu.cli.compare normal \
    --predRoot NYU_results --gtRoot "$NYU_ROOT/normals" --level 1
python -m inverserenderingofindoorscene_tpu.cli.compare depth \
    --predRoot NYU_results --gtRoot "$NYU_ROOT/depths" --level 1
