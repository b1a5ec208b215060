#!/usr/bin/env bash
# Center-Gaussian baseline sweep on the hard-way test set (reference run_hardway_testset.sh).
set -euo pipefail
python -m avtubes.cli.baseline_gaussian \
  --testset flickr --og_data_path "${OG_DATA_PATH:?}" --og_gt_path "${OG_GT_PATH:?}" "$@"
