#!/usr/bin/env bash
# 1-frame hard-way recipe (reference run_hardway_train_1frm.sh): batch 3, lr 1e-6.
set -euo pipefail
python -m avtubes.cli.train_hardway_1frame \
  --testset flickr --subset 144 \
  --data_path "${DATA_PATH:?}" --og_data_path "${OG_DATA_PATH:?}" \
  --og_gt_path "${OG_GT_PATH:?}" \
  --summaries_dir "${SUMMARIES_DIR:-checkpoints/}" \
  --batch_size 3 --learning_rate 1e-6 --epochs 200 "$@"
