#!/usr/bin/env bash
# Stage 1: CAM classifier on YouTube-Objects v1.0
# (recipe mirror of /root/reference/README.md:229-266)
python main.py \
  --dataset YouTube-Objects-v1.0 \
  --task STD_CL --arch STDClassifier \
  --encoder_name resnet50 --method CAM --spatial_pooling WGAP \
  --opt_name sgd --lr 0.001 --batch_size 32 --max_epochs 100 \
  --exp_id stage1
