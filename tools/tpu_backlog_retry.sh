#!/bin/bash
# Re-run ONLY the items that failed in the 2026-08-18 morning backlog run
# (suite NameError, swin_ab HTTP 413, merged_ab illegal BlockSpec,
# deberta_bwd/ft_ab Mosaic strided-rotate, swin_bwd oracle protocol,
# pipeline 90-min timeout) — all root-caused and fixed in 4b30b2f.
# The passing items (bench, tp_ab, finetune_ab, int8_ab, serving,
# train_drive/prefetch) already have fresh numbers in this morning's logs.
#
#   bash tools/tpu_backlog_retry.sh [LOGDIR]
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/tpu_retry_$(date +%H%M)}
mkdir -p "$LOGDIR"
echo "=== TPU backlog RETRY, logs in $LOGDIR ==="

run() {
  local name=$1; shift
  echo "--- $name: $* ($(date +%H:%M:%S))"
  timeout "$TMO" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc ($(date +%H:%M:%S)); tail:"
  tail -3 "$LOGDIR/$name.log"
  return $rc
}

TMO=3600 run suite        python benchmarks/bench_suite.py
TMO=1800 run swin_ab      python benchmarks/bench_swin_ab.py
TMO=1800 run deberta_bwd  python benchmarks/validate_deberta_bwd_tpu.py
TMO=2400 run deberta_ft_ab python benchmarks/bench_deberta_ft_ab.py
TMO=1800 run swin_bwd     python benchmarks/validate_swin_bwd_tpu.py
# full production-scale pipeline (morning run died at TMO=5400 after
# 79 min of pre-train stages; give the train+eval tail real headroom)
TMO=14400 run pipeline    python -m mmd_tpu.pipelines.run_all \
    --synthetic 35000 --image_size 256 --reference_encoders \
    --timings_json benchmarks/pipeline_timings.json \
    --root "$LOGDIR/pipe_root"
TMO=300  run regen        python benchmarks/bench_suite.py --write_only
echo "=== retry done ($(date +%H:%M:%S)) — see $LOGDIR ==="
