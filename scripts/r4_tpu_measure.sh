#!/bin/bash
# Sequential round-4 TPU measurement pass (after cross_tail + split FPS).
# ONE TPU client at a time — concurrent clients wedge the axon tunnel grant.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/r4_tpu_measure.log
{
  echo "=== cross_tail TPU exactness/perf $(date) ==="
  timeout 1200 python scripts/cross_tail_check.py
  echo "=== train_headroom $(date) ==="
  timeout 1800 python scripts/train_headroom.py
  echo "=== eval wall (synthetic 16, random-init protocol) $(date) ==="
  timeout 1800 python test.py --synthetic 16
  echo "=== knn_mode_compare on converge_r4 $(date) ==="
  timeout 1800 python scripts/knn_mode_compare.py runs/converge_r4/ckpt
  echo "=== eval CLI approx on converge_r4 ckpt $(date) ==="
  timeout 1800 python test.py --synthetic 16 --pretrain_model runs/converge_r4/ckpt
  echo "=== eval CLI exact on converge_r4 ckpt $(date) ==="
  timeout 1800 python test.py --synthetic 16 --pretrain_model runs/converge_r4/ckpt --knn_mode exact
  echo "=== bench $(date) ==="
  timeout 2400 python bench.py
  echo "=== done $(date) ==="
} >> "$LOG" 2>&1
