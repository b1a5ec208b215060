#!/usr/bin/env bash
# Offline dataset curation (reference create_train_set.sh): download -> validate
# -> sample train subsets -> extract JPEG clips.
set -euo pipefail
python -m avtubes.tools.download_flickr --urls "${URLS:?}" --ids "${IDS:?}" --out "${DATA_PATH:?}"
python -m avtubes.tools.create_training_set --root "$DATA_PATH" --metadata_dir "${METADATA_DIR:-metadata}"
python -m avtubes.tools.convert_to_jpg --root "$DATA_PATH" --ids "${METADATA_DIR:-metadata}/flickr_train10k.csv"
