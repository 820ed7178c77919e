#!/usr/bin/env bash
# Download + unpack YouTube-Objects v1.0 (ETH Zurich release), then build
# the wsol-done-right metadata folds.
# (capability mirror of /root/reference/cmds/download-YouTube-Objects-v1.0.sh)
set -euo pipefail
ROOT="${TCAM_TPU_DATA_ROOT:-$HOME/datasets}"
mkdir -p "$ROOT" && cd "$ROOT"
for cls in aeroplane bird boat car cat cow dog horse motorbike train; do
  wget -c "https://data.vision.ee.ethz.ch/cvl/youtube-objects/categories/${cls}.tar.gz"
  tar -xzf "${cls}.tar.gz" -C .
done
python - <<'PY'
import os
from tcam_wsol_video_tpu.data.builders import build_metadata
root = os.environ.get("TCAM_TPU_DATA_ROOT", os.path.expanduser("~/datasets"))
build_metadata(root, os.path.join(root, "folds", "YouTube-Objects-v1.0"),
               version="v1.0")
PY
