#!/usr/bin/env bash
# Block-size sweep (reference run_block_sweep.sh semantics): run the CLI per
# block size, grep the canonical metric lines into summary.csv.
#
# Env: MODEL, DRAFT, DATASET, BLOCK_SIZES ("4 8 12 16 20 24"),
#      MAX_NEW_TOKENS, MAX_SAMPLES, SKIP_BASELINE, OUT_DIR, EXTRA_ARGS
set -euo pipefail

MODEL=${MODEL:-tiny}
DRAFT=${DRAFT:-auto:1}
DATASET=${DATASET:-math500}
BLOCK_SIZES=${BLOCK_SIZES:-"4 8 12 16 20 24"}
MAX_NEW_TOKENS=${MAX_NEW_TOKENS:-256}
MAX_SAMPLES=${MAX_SAMPLES:-8}
OUT_DIR=${OUT_DIR:-results/block_sweep}
EXTRA_ARGS=${EXTRA_ARGS:-}
CONTINUE_ON_ERROR=${CONTINUE_ON_ERROR:-1}

mkdir -p "$OUT_DIR"
CSV="$OUT_DIR/summary.csv"
echo "block_size,baseline_tpot_s,spec_tpot_s,spec_tokens_per_sec,speedup,tau" > "$CSV"

grab() { grep -m1 "^$2" "$1" | awk '{print $NF}' || echo ""; }

for bs in $BLOCK_SIZES; do
  LOG="$OUT_DIR/bs${bs}.log"
  echo "=== block_size=$bs ==="
  if ! python -m dflash_tpu.bench.cli \
      --model-name-or-path "$MODEL" --draft-name-or-path "$DRAFT" \
      --dataset "$DATASET" --max-samples "$MAX_SAMPLES" \
      --max-new-tokens "$MAX_NEW_TOKENS" --block-size "$bs" \
      ${SKIP_BASELINE:+--skip-baseline} $EXTRA_ARGS > "$LOG" 2>&1; then
    echo "$bs,ERROR,,,," >> "$CSV"
    [[ "$CONTINUE_ON_ERROR" == "1" ]] || exit 1
    continue
  fi
  base_tpot=$(grab "$LOG" "Baseline TPOT:")
  spec_tpot=$(grab "$LOG" "Speculative TPOT:")
  tps=$(grab "$LOG" "Speculative tokens_per_sec:")
  speedup=$(grab "$LOG" "Decoding speedup:")
  tau=$(grab "$LOG" "Average Acceptance length:")
  echo "$bs,$base_tpot,$spec_tpot,$tps,$speedup,$tau" >> "$CSV"
done
cat "$CSV"
