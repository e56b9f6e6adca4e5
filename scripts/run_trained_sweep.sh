#!/bin/bash
# Train the sweep configs to convergence, one at a time (the pooled TPU
# tunnel cannot take concurrent processes — CLAUDE.md), each writing the
# reference-schema per-image CSV that make_trained_compare.py assembles
# into the compareModels report (reference model/CE/test/ +
# compareModels.py workflow).
#
# Round 5: the synthetic set scales to SWEEP_SAMPLES (default 1600 —
# 1120/240/240 train/val/test, matching the statistical power of the
# reference's 500-row committed CSVs, model/CE/datasetTestViTmodel.py:174)
# and checkpoints persist to SWEEP_CKPT_DIR for the int8-quality sweep
# (scripts/quant_quality_sweep.py) and the compare report.
#
# Env: SWEEP_SAMPLES (1600), SWEEP_CKPT_DIR (/root/ckpts_sweep_r5),
#      SWEEP_FORCE=1 re-runs configs whose CSV already exists.
set -u
cd "$(dirname "$0")/.."
LOG_DIR=/tmp/trained_sweep_logs
mkdir -p "$LOG_DIR"
SAMPLES="${SWEEP_SAMPLES:-1600}"
CKPT_DIR="${SWEEP_CKPT_DIR:-/root/ckpts_sweep_r5}"

run() {
  local cfg="$1"; shift
  local tag="ce_$(echo "$cfg" | tr 'A-Z' 'a-z')"
  local accum="${1:-1}"
  if [ -z "${SWEEP_FORCE:-}" ] && \
     [ -f "examples/convergence/${tag}/${cfg}_metrics.csv" ] && \
     [ -d "$CKPT_DIR/$tag" ]; then
    echo "== $cfg already done, skipping"
    return 0
  fi
  echo "== $cfg (accum=$accum, samples=$SAMPLES) start $(date +%T)"
  CONV_CONFIG="$cfg" CONV_LR=1e-4 CONV_TAG="$tag" CONV_ACCUM="$accum" \
  CONV_SAMPLES="$SAMPLES" CONV_SAVE_CKPT="$CKPT_DIR" \
    timeout 7200 python scripts/train_convergence.py ce \
    > "$LOG_DIR/$cfg.log" 2>&1
  local rc=$?
  echo "== $cfg done rc=$rc $(date +%T)"
  tail -3 "$LOG_DIR/$cfg.log"
}

run P16H512A8
run P16H768A12
run P16H1024A16
run P8H512A8
run P8H768A12
run P8H1024A16
run P4H512A8
run P4H768A12 2
run P4H1024A16 4
echo "ALL DONE $(date +%T)"
