#!/bin/bash
# Round-5 matched-seed convergence A/B/C (VERDICT r4 #4 and #6).
# Same seed-0 synthetic data and init for all three runs; the ONLY change:
#   A: f32 activations, approx kNN (baseline, = r4 protocol)
#   B: bf16 activations, approx kNN   (--compute_dtype bfloat16)
#   C: f32 activations, exact kNN     (--knn_mode exact, new Pallas kernel)
# ONE TPU client at a time — concurrent clients wedge the axon tunnel grant.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/r5_converge.log
{
  for tag in f32 bf16 exact; do
    case $tag in
      f32)   extra="";;
      bf16)  extra="--compute_dtype bfloat16";;
      exact) extra="--knn_mode exact";;
    esac
    echo "=== train $tag $(date) ==="
    timeout 14400 python train.py --synthetic 64 --epochs 200 --batch_size 2 \
      --seed 0 --save_dir runs/converge_r5_$tag $extra \
      --metrics_csv runs/converge_r5_${tag}_metrics.csv --log_every 1000
    echo "=== eval $tag (approx eval protocol) $(date) ==="
    timeout 3600 python test.py --synthetic 16 \
      --pretrain_model runs/converge_r5_$tag/ckpt \
      > runs/converge_r5_${tag}_eval.json.log 2>&1
    tail -1 runs/converge_r5_${tag}_eval.json.log
  done
  echo "=== done $(date) ==="
} >> "$LOG" 2>&1
