#!/usr/bin/env bash
# Qualitative overlay dumps (reference visualizations.sh).
set -euo pipefail
python -m avtubes.cli.visualize \
  --testset flickr --og_data_path "${OG_DATA_PATH:?}" --og_gt_path "${OG_GT_PATH:?}" \
  --summaries_dir "${SUMMARIES_DIR:-checkpoints/}" --out_dir "${OUT_DIR:-visualizations}" "$@"
