#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 #3/#4/#6/#7 + quality --fast).
# One heavy job at a time (the box has ONE CPU core). Run AFTER the 35k
# fused pipeline finishes — never concurrently with it.
#
#   bash tools/tpu_backlog_r5.sh [LOGDIR]
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/tpu_backlog_r5_$(date +%H%M)}
mkdir -p "$LOGDIR"
echo "=== round-5 TPU backlog, logs in $LOGDIR ==="

run() {
  local name=$1; shift
  echo "--- $name: $* ($(date +%H:%M:%S))"
  timeout "$TMO" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ($(date +%H:%M:%S)); tail:"
  tail -3 "$LOGDIR/$name.log"
  return $rc
}

# Where do Swinv2's cycles go (26.6% MFU)? Decide the kernel lever.
TMO=1800 run profile_swin python benchmarks/profile_swin.py
# SwinConfig.fused_train decision row (bwd kernel validated, ships dark)
TMO=2400 run swin_ft_ab   python benchmarks/bench_swin_ft_ab.py
# post-fused_train re-measure: raw path (heaviest graph, traced-k fori)
TMO=3600 run bench_raw    python benchmarks/bench_raw.py
# post-fused_train re-measure: fine-tune step +/- remat
TMO=2400 run finetune_ab  python benchmarks/bench_finetune_ab.py
# serving QPS with device-resident embeddings + per-stage breakdown
TMO=1800 run serving      python benchmarks/bench_serving.py
# validate the --fast quality tier once end-to-end
TMO=1800 run quality_fast python benchmarks/quality_suite.py --fast

echo "=== done; grep rc= above, then update BENCHMARKS.md rows ==="
