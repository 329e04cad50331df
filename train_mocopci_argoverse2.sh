#!/bin/bash
# Argoverse 2 preset (NL-Drive scene01).
python train.py \
    --data_root ${NL_DRIVE_ROOT:-data/NL-Drive} \
    --scene_list ${NL_DRIVE_ROOT:-data/NL-Drive}/train_scene01 \
    --batch_size 2 --epochs 400 --npoints 8192 \
    2>&1 | tee .log_train_argoverse2
