#!/usr/bin/env bash
# Full two-stage TCAM recipe at eval resolution (224px, resize 256) run
# end-to-end through the production CLIs on one TPU chip — the handoff
# the reference documents at /root/reference/README.md:229-339:
#   stage-1 STD_CL train -> dump_cams store -> stage-2 TCAM train
#   (sl + CRF + size losses, frozen stage-1 classifier) -> standalone
#   evaluate -> demo video.
# Dataset: synthetic multi-shot videos (same folds layout as YTOv1) so
# the run needs no YouTube-Objects download.
#
# Usage: bash cmds/e2e_synth224_tpu.sh [workdir] (default /tmp/e2e224)
# S2_EXTRA passes extra stage-2 flags (e.g. "--crf_impl landmarks" or
# "--crf_tc_scale 0.5 --crf_tc_lambda 3.2e-8" for the TPU speed recipes).
set -e
cd "$(dirname "$0")/.."
ROOT=${1:-/tmp/e2e224}
OUT=$ROOT/exps
EPOCHS_S1=${EPOCHS_S1:-8}
EPOCHS_S2=${EPOCHS_S2:-8}
S2_EXTRA=${S2_EXTRA:-}
S2_ID=${S2_ID:-s2}

python - <<EOF
from tcam_wsol_video_tpu.data.synthetic import make_synthetic_dataset
import os
if not os.path.isdir("$ROOT/folds"):
    make_synthetic_dataset("$ROOT", n_classes=3, n_videos_per_class=2,
                           n_shots_per_video=2, n_frames_per_shot=8,
                           frame_hw=(270, 360))
    print("synthetic 224-ready dataset at $ROOT")
EOF

COMMON="--dataset YouTube-Objects-v1.0 --data_root $ROOT \
  --metadata_root $ROOT/folds --crop_size 224 --resize_size 256 \
  --cam_curve_interval 0.01 --num_workers 4"
TAG=YouTube-Objects-v1.0-resnet50-CAM-WGAP-cp_best_localization-boxv2_True

# ---- stage 1: STD_CL classifier (CAM/WGAP, reference README.md:229-266)
python main.py $COMMON --task STD_CL \
  --batch_size 8 --eval_batch_size 32 --max_epochs $EPOCHS_S1 --lr 0.01 \
  --checkpoint_save 0 --outd $OUT --exp_id s1
S1=$OUT/$TAG/s1

# ---- stage-1 -> stage-2 handoff: per-frame CAM store + Otsu ROI
python -m tcam_wsol_video_tpu.cli.dump_cams $COMMON --task STD_CL \
  --exp_dir $S1 --out $ROOT/cam_store

# ---- stage 2: TCAM (sl_tc + crf_tc + max_sizepos_tc,
#      reference README.md:273-339)
# seeder/CRF values mirror the published recipe
# (/root/reference/README.md:286-339)
python main.py $COMMON --task TCAM --arch UnetTCAM \
  --batch_size 8 --eval_batch_size 32 --max_epochs $EPOCHS_S2 --lr 0.01 \
  --elb_init_t 1.0 --elb_max_t 10.0 --elb_mulcoef 1.01 \
  --sl_tc True --sl_tc_lambda 1.0 --sl_tc_min 1 --sl_tc_max 1 \
  --sl_tc_ksz 3 --sl_tc_max_p 0.6 --sl_tc_min_p 0.1 \
  --sl_tc_seed_tech seed_weighted --sl_tc_use_roi True \
  --sl_tc_roi_method roi_all --sl_tc_roi_min_size 0.05 \
  --sl_tc_knn 1 --sl_tc_knn_mode before --sl_tc_knn_t 0.0 \
  --crf_tc True --crf_tc_lambda 2e-9 --crf_tc_sigma_rgb 15.0 \
  --crf_tc_sigma_xy 100.0 --crf_tc_scale 1.0 \
  --max_sizepos_tc True --max_sizepos_tc_lambda 0.01 \
  --folder_pre_trained_cl $S1 --std_cams_folder $ROOT/cam_store \
  --checkpoint_save 0 --outd $OUT --exp_id $S2_ID $S2_EXTRA
S2=$OUT/$TAG/$S2_ID

# ---- standalone eval of the stage-2 best-localization checkpoint
python eval.py $COMMON --task TCAM --arch UnetTCAM \
  --exp_dir $S2 --split test

# ---- demo video over test frames
python -m tcam_wsol_video_tpu.cli.demo_video $COMMON --task TCAM \
  --arch UnetTCAM --exp_dir $S2 --out $ROOT/demos --split test

echo "E2E 224px two-stage run complete: $S2"
