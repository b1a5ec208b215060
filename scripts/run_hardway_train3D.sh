#!/usr/bin/env bash
# 3D tube training (reference run_hardway_train3D.sh).
set -euo pipefail
python -m avtubes.cli.train_3d \
  --testset flickr --subset 10 \
  --data_path "${DATA_PATH:?}" --og_data_path "${OG_DATA_PATH:-$DATA_PATH}" \
  --og_gt_path "${OG_GT_PATH:?}" \
  --summaries_dir "${SUMMARIES_DIR:-checkpoints/}" \
  --batch_size 20 --learning_rate 4e-6 --epochs 200 --frame_density 16 "$@"
