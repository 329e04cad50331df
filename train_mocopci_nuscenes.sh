#!/bin/bash
# NuScenes preset (NL-Drive scene02); 250 epochs as in the reference.
python train.py \
    --data_root ${NL_DRIVE_ROOT:-data/NL-Drive} \
    --scene_list ${NL_DRIVE_ROOT:-data/NL-Drive}/train_scene02 \
    --batch_size 2 --epochs 250 --npoints 8192 \
    2>&1 | tee .log_train_nuscenes
