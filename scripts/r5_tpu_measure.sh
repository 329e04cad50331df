#!/bin/bash
# Sequential round-5 TPU measurement pass. ONE TPU client at a time.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/r5_tpu_measure.log
{
  echo "=== bf16 NaN probe $(date) ==="
  timeout 2400 python scripts/bf16_nan_probe.py
  echo "=== train_headroom $(date) ==="
  timeout 2400 python scripts/train_headroom.py
  echo "=== exact knn micro $(date) ==="
  timeout 1200 python scripts/exact_knn_tpu.py
  echo "=== knn_mode_compare on converge_r5_f32 ckpt $(date) ==="
  timeout 1800 python scripts/knn_mode_compare.py runs/converge_r5_f32/ckpt
  echo "=== eval CLI exact-kNN on converge_r5_f32 ckpt $(date) ==="
  timeout 1800 python test.py --synthetic 16 --pretrain_model runs/converge_r5_f32/ckpt \
    --knn_mode exact > runs/converge_r5_f32_eval_exact.json.log 2>&1
  tail -1 runs/converge_r5_f32_eval_exact.json.log
  echo "=== eval CLI emd_fast on converge_r5_f32 ckpt $(date) ==="
  timeout 1800 python test.py --synthetic 16 --pretrain_model runs/converge_r5_f32/ckpt \
    --emd_fast > runs/converge_r5_f32_eval_emdfast.json.log 2>&1
  tail -1 runs/converge_r5_f32_eval_emdfast.json.log
  echo "=== bench $(date) ==="
  timeout 3600 python bench.py
  echo "=== done $(date) ==="
} >> "$LOG" 2>&1
