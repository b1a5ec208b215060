#!/usr/bin/env bash
# Quantitative cIoU/AUC bench (reference run_quantitative.sh).
set -euo pipefail
python -m avtubes.cli.test_quantitative \
  --testset "${TESTSET:-flickr}" \
  --og_data_path "${OG_DATA_PATH:?}" --og_gt_path "${OG_GT_PATH:?}" \
  --summaries_dir "${SUMMARIES_DIR:-checkpoints/}" "$@"
