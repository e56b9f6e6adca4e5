#!/bin/bash
# Train the remaining sweep configs to convergence, one at a time (the
# pooled TPU tunnel cannot take concurrent processes — CLAUDE.md), each
# writing the reference-schema per-image CSV that make_trained_compare.py
# assembles into the compareModels report (reference model/CE/test/ +
# compareModels.py workflow).  P4H1024A16 already committed (ce_p4h1024).
set -u
cd "$(dirname "$0")/.."
LOG_DIR=/tmp/trained_sweep_logs
mkdir -p "$LOG_DIR"

run() {
  local cfg="$1"; shift
  local tag="ce_$(echo "$cfg" | tr 'A-Z' 'a-z')"
  local accum="${1:-1}"
  if [ -f "examples/convergence/${tag}/${cfg}_metrics.csv" ]; then
    echo "== $cfg already done, skipping"
    return 0
  fi
  echo "== $cfg (accum=$accum) start $(date +%T)"
  CONV_CONFIG="$cfg" CONV_LR=1e-4 CONV_TAG="$tag" CONV_ACCUM="$accum" \
    timeout 3600 python scripts/train_convergence.py ce \
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
echo "ALL DONE $(date +%T)"
