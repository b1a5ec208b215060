#!/usr/bin/env bash
# 16-frame hard-way training recipe of record (reference run_hardway_train.sh):
# flickr10k, batch 20, lr 4e-6, 200 epochs, Adam wd 1e-4, MultiStepLR [60,100,150,180].
set -euo pipefail
python -m avtubes.cli.train_hardway \
  --testset flickr --subset 10 \
  --data_path "${DATA_PATH:?set DATA_PATH to the flickr root}" \
  --og_data_path "${OG_DATA_PATH:?set OG_DATA_PATH to the hardway test root}" \
  --gt_path "${GT_PATH:-}" --og_gt_path "${OG_GT_PATH:?set OG_GT_PATH}" \
  --summaries_dir "${SUMMARIES_DIR:-checkpoints/}" \
  --batch_size 20 --learning_rate 4e-6 --epochs 200 \
  --frame_density 16 --sampling_rate 16 --loss_weight 0.1 "$@"
