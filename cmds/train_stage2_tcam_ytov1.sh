#!/usr/bin/env bash
# Stage 2: TCAM (recipe mirror of /root/reference/README.md:273-339)
TAG="YouTube-Objects-v1.0-resnet50-CAM-WGAP-cp_best_localization-boxv2_True"
python -m tcam_wsol_video_tpu.cli.dump_cams \
  --dataset YouTube-Objects-v1.0 --task STD_CL \
  --exp_dir exps/${TAG}/stage1 --out data_cams/${TAG}_cams_train

python main.py \
  --dataset YouTube-Objects-v1.0 \
  --task TCAM --arch UnetTCAM \
  --encoder_name resnet50 --method CAM --spatial_pooling WGAP \
  --opt_name sgd --lr 0.01 --batch_size 32 --max_epochs 100 \
  --freeze_cl true --folder_pre_trained_cl exps/${TAG}/stage1 \
  --std_cams_folder data_cams/${TAG}_cams_train \
  --sl_tc true --sl_tc_knn 1 --sl_tc_knn_mode before-after \
  --sl_tc_knn_t 1.0 --sl_tc_seed_tech seed_weighted --sl_tc_use_roi true \
  --crf_tc true --crf_tc_lambda 2e-9 --crf_tc_sigma_rgb 15 \
  --crf_tc_sigma_xy 100 \
  --max_sizepos_tc true --max_sizepos_tc_lambda 0.01 \
  --elb_init_t 1.0 --elb_max_t 10.0 --elb_mulcoef 1.01 \
  --crf_impl landmarks \
  --exp_id stage2
# --crf_impl landmarks is the recommended TPU production setting: the
# Nystrom landmark filter matches the exact dense kernel to gradient
# cosine 1.000000 at the recipe operating point and runs the step ~4.3x
# faster (PARITY.md "CRF landmarks").  Drop the flag for the exact
# dense-kernel CRF.
