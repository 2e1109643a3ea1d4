#!/bin/bash
# Full in-the-wild inference over the Garon19 real-image set
# (the runReal20.sh equivalent).
set -e
IM_LIST=${1:?usage: run_real20.sh <image_list.txt> [output_dir]}
OUT=${2:-Real20_results}
python -m inverserenderingofindoorscene_tpu.cli.test_real \
    --imList "$IM_LIST" --output "$OUT" --level 2 --isLight --isBS
