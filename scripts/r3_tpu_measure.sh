#!/bin/bash
# Sequential TPU measurement pass after the fusion-plane kernel landed.
# ONE TPU client at a time — concurrent clients wedge the axon tunnel grant.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/r3_tpu_measure.log
{
  echo "=== fusion_plane_experiments $(date) ==="
  timeout 1800 python scripts/fusion_plane_experiments.py
  echo "=== train_headroom $(date) ==="
  timeout 1800 python scripts/train_headroom.py
  echo "=== eval_headroom $(date) ==="
  timeout 1800 python scripts/eval_headroom.py
  echo "=== bench $(date) ==="
  timeout 1800 python bench.py
  echo "=== done $(date) ==="
} >> "$LOG" 2>&1
