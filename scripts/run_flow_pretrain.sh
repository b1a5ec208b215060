#!/usr/bin/env bash
# Unsupervised FlowNetLite pretraining (photometric + smoothness on
# consecutive-frame pairs), then the flow-consistency trainer auto-loads
# the checkpoint.  Mirrors the reference's two-stage flow story
# (flow.py loads pretrained FlowNet2 weights; we pretrain our own).
#
#   DATA_PATH=/path/to/flickr METADATA_DIR=metadata ./scripts/run_flow_pretrain.sh
set -euo pipefail

python -m avtubes.cli.flow --train_flow \
    --data_path "${DATA_PATH:?set DATA_PATH}" \
    --metadata_dir "${METADATA_DIR:-metadata}" \
    --summaries_dir "${SUMMARIES_DIR:-summaries}" \
    --epochs "${EPOCHS:-5}" \
    --batch_size "${BATCH_SIZE:-4}" \
    "$@"
