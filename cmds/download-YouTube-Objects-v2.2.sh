#!/usr/bin/env bash
# Download + unpack YouTube-Objects v2.2 and build metadata folds.
set -euo pipefail
ROOT="${TCAM_TPU_DATA_ROOT:-$HOME/datasets}"
mkdir -p "$ROOT" && cd "$ROOT"
wget -c "https://data.vision.ee.ethz.ch/cvl/youtube-objects/youtube-objects-v2.2.tar.gz"
tar -xzf youtube-objects-v2.2.tar.gz -C .
python - <<'PY'
import os
from tcam_wsol_video_tpu.data.builders import build_metadata
root = os.environ.get("TCAM_TPU_DATA_ROOT", os.path.expanduser("~/datasets"))
build_metadata(root, os.path.join(root, "folds", "YouTube-Objects-v2.2"),
               version="v2.2")
PY
