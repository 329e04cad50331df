#!/bin/bash
# KITTI Odometry preset (NL-Drive scene00) — mirrors the reference launcher.
python train.py \
    --data_root ${NL_DRIVE_ROOT:-data/NL-Drive} \
    --scene_list ${NL_DRIVE_ROOT:-data/NL-Drive}/train_scene \
    --batch_size 2 --epochs 400 --npoints 8192 \
    2>&1 | tee .log_train_kitti
