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
  echo "=== bench $(date) ==="
  timeout 3600 python bench.py
  echo "=== done $(date) ==="
} >> "$LOG" 2>&1
