#!/bin/bash
python test.py \
    --data_root ${NL_DRIVE_ROOT:-data/NL-Drive} \
    --scene_list ${NL_DRIVE_ROOT:-data/NL-Drive}/test_scene01_list.txt \
    --batch_size 1 --npoints 8192 --pretrain_model "$1"
