#!/bin/bash
# Burn down the TPU measurement backlog in ONE session (VERDICT r3 #2/#3).
#
# Run the moment the axon tunnel returns (the /tmp watcher invokes this
# automatically). Every step logs to $LOGDIR and keeps going on failure so
# one bad step doesn't strand the rest of the session. Order matters:
# cheapest/highest-value first, the 35k-row pipeline run last (longest).
#
#   bash tools/tpu_backlog.sh [LOGDIR]
#
# Afterwards: inspect the A/B deltas, flip SwinConfig.fused_attn /
# ModelConfig.merged_paths / stacked_heads defaults if they win (or commit
# the negative result), and commit benchmarks/results.json +
# BENCHMARKS.md + BASELINE.md + pipeline_timings.json.
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/tpu_backlog_$(date +%H%M)}
mkdir -p "$LOGDIR"
echo "=== TPU backlog run, logs in $LOGDIR ==="

run() {
  local name=$1; shift
  echo "--- $name: $* ($(date +%H:%M:%S))"
  timeout "$TMO" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ($(date +%H:%M:%S)); tail:"
  tail -3 "$LOGDIR/$name.log"
  return $rc
}

TMO=900  run graft_entry python __graft_entry__.py
TMO=1200 run bench       python bench.py
TMO=3600 run suite       python benchmarks/bench_suite.py
TMO=1800 run swin_ab     python benchmarks/bench_swin_ab.py
TMO=1800 run tp_ab       python benchmarks/bench_tp_ab.py
TMO=1200 run train_drive python train.py --synthetic_samples 512 --epochs 2 \
    --log_every 4 --output_dir "$LOGDIR/train_run"
# same drive with device-input pipelining: compare samples/s vs train_drive
TMO=1200 run train_prefetch python train.py --synthetic_samples 512 --epochs 2 \
    --log_every 4 --prefetch_depth 2 --output_dir "$LOGDIR/train_prefetch"
# remat FLOPs tax on the fine-tuning step (same-process A/B)
TMO=2400 run finetune_ab  python benchmarks/bench_finetune_ab.py
# int8 vs bf16 corpus retrieval scoring (same-process A/B)
TMO=1800 run int8_ab      python benchmarks/bench_int8_ab.py
# end-to-end serving QPS through the batching engine (tunnel lower bound)
TMO=1800 run serving      python benchmarks/bench_serving.py
# Mosaic-compile + grad validation of the DeBERTa trainable-kernel bwd;
# on pass, DebertaConfig.fused_train is safe to flip for fine-tuning
TMO=1800 run deberta_bwd  python benchmarks/validate_deberta_bwd_tpu.py
# ...and what it buys end-to-end (run after deberta_bwd passes)
TMO=2400 run deberta_ft_ab python benchmarks/bench_deberta_ft_ab.py
# same for the Swin window-attention backward (SwinConfig.fused_train)
TMO=1800 run swin_bwd     python benchmarks/validate_swin_bwd_tpu.py
# ...and what it buys end-to-end (run after swin_bwd passes; flip
# SwinConfig.fused_train's default on a clear win)
TMO=2400 run swin_ft_ab   python benchmarks/bench_swin_ft_ab.py
TMO=5400 run pipeline    python -m mmd_tpu.pipelines.run_all \
    --synthetic 35000 --image_size 256 --reference_encoders \
    --timings_json benchmarks/pipeline_timings.json \
    --root "$LOGDIR/pipe_root"
# regenerate the number docs from the fresh results.json + timings
TMO=300  run regen       python benchmarks/bench_suite.py --write_only
echo "=== backlog done ($(date +%H:%M:%S)) — see $LOGDIR ==="
