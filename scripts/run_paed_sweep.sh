#!/bin/bash
# Binary-PAED 9-config sweep on TRAINED weights — the driver-script surface
# the reference ships but never exercised (model/PAED/ViTscriptTest.py:97-188
# — and its committed form evaluates a pinned P16H512A8 regardless of the
# loop config, ViTscriptTest.py:126, a bug this sweep fixes by evaluating
# each config with its own trained weights). The reference committed no PAED
# sweep outputs at all; this produces them.
#
# One config at a time (pooled TPU tunnel — CLAUDE.md), each: short
# convergence run on the seeded synthetic binary set (crack_half_width=2,
# same generator/seed as the committed paed_binary convergence run), save
# checkpoint, then eval-sweep + compare produce the reference-schema CSVs
# and report.
#
# Env: PAED_SAMPLES (600), PAED_EPOCHS (120), PAED_CKPT (/root/ckpts_paed_r5)
#
# 120 epochs, not 40: the PAED loss has a long all-background plateau before
# the crack class lifts off — the committed P8H512A8 convergence run sat at
# val_IoU=0 for 43 epochs and lifted off at epoch 44 (after the plateau
# scheduler's patience-30 LR cut; examples/convergence/paed_binary/
# metrics.csv). A 40-epoch budget reproduced exactly that plateau and
# nothing after it (measured in round 5).
set -u
cd "$(dirname "$0")/.."
LOG_DIR=/tmp/paed_sweep_logs
mkdir -p "$LOG_DIR"
SAMPLES="${PAED_SAMPLES:-600}"
EPOCHS="${PAED_EPOCHS:-120}"
CKPT="${PAED_CKPT:-/root/ckpts_paed_r5}"

run() {
  local cfg="$1"; shift
  local accum="${1:-1}"
  if [ -d "$CKPT/$cfg" ]; then
    echo "== paed $cfg already trained, skipping"
    return 0
  fi
  echo "== paed $cfg (accum=$accum, samples=$SAMPLES) start $(date +%T)"
  # CONV_NO_EARLYSTOP: patience-6 val_loss early stopping (the reference
  # recipe, ViTscript.py:70) fires inside the all-background plateau at this
  # dataset scale (measured: stop at epoch 9, val_IoU still 0) — the fixed
  # epoch budget is the honest sweep recipe, like the committed 120-epoch
  # convergence run.
  CONV_CONFIG="$cfg" CONV_LR=3e-4 CONV_TAG="paed_$cfg" CONV_ACCUM="$accum" \
  CONV_SAMPLES="$SAMPLES" CONV_EPOCHS="$EPOCHS" CONV_SAVE_CKPT="$CKPT" \
  CONV_NO_EARLYSTOP=1 \
    timeout 7200 python scripts/train_convergence.py paed_binary \
    > "$LOG_DIR/$cfg.log" 2>&1
  local rc=$?
  # eval-sweep expects <ckpt-root>/<CONFIG>/; train_convergence saved under
  # the CONV_TAG dir.
  [ -d "$CKPT/paed_$cfg" ] && mv "$CKPT/paed_$cfg" "$CKPT/$cfg"
  echo "== paed $cfg done rc=$rc $(date +%T)"
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

# The sweep evaluator + compare report on the trained checkpoints.
DATA=/tmp/paed_sweep_data
if [ ! -d "$DATA/image_png" ]; then
  python - <<EOF
from visiontransformer_tpu.data.synthetic import generate_binary
generate_binary("$DATA", n_samples=$SAMPLES, image_size=224,
                crack_half_width=2)
EOF
fi
timeout 3600 python -m visiontransformer_tpu eval-sweep --task paed_binary \
  --data "$DATA" --ckpt-root "$CKPT" --out /tmp/paed_sweep_out \
  --batch-size 4 --num-batches 1000000 \
  > "$LOG_DIR/eval_sweep.log" 2>&1
echo "eval-sweep rc=$?"; tail -3 "$LOG_DIR/eval_sweep.log"
timeout 600 python -m visiontransformer_tpu compare \
  --dir /tmp/paed_sweep_out --out /tmp/paed_sweep_out/comparison \
  --num-classes 2 > "$LOG_DIR/compare.log" 2>&1
echo "compare rc=$?"; tail -3 "$LOG_DIR/compare.log"
echo "PAED SWEEP ALL DONE $(date +%T)"
