#!/usr/bin/env bash
# Candidate-mode grid sweep (reference run_fixed_prefix_sweep.sh semantics):
# (prefix_len x top_k x max_candidates) grid with the skip rule
# max_candidates > top_k, metrics grepped into summary.csv.
set -euo pipefail

MODEL=${MODEL:-tiny}
DRAFT=${DRAFT:-auto:1}
DATASET=${DATASET:-math500}
PREFIX_LENS=${PREFIX_LENS:-"1 2 4"}
TOP_KS=${TOP_KS:-"2 4"}
MAX_CANDIDATES=${MAX_CANDIDATES:-"2 4"}
CANDIDATE_MODE=${CANDIDATE_MODE:-fixed_prefix_rank}
MAX_NEW_TOKENS=${MAX_NEW_TOKENS:-256}
MAX_SAMPLES=${MAX_SAMPLES:-8}
OUT_DIR=${OUT_DIR:-results/fixed_prefix_sweep}
EXTRA_ARGS=${EXTRA_ARGS:-}

mkdir -p "$OUT_DIR"
CSV="$OUT_DIR/summary.csv"
echo "prefix_len,top_k,max_candidates,spec_tpot_s,spec_tokens_per_sec,speedup,tau" > "$CSV"
grab() { grep -m1 "^$2" "$1" | awk '{print $NF}' || echo ""; }

for p in $PREFIX_LENS; do
  for k in $TOP_KS; do
    for c in $MAX_CANDIDATES; do
      if (( c > k )); then
        echo "skip p=$p k=$k c=$c (max_candidates > top_k)"
        continue
      fi
      LOG="$OUT_DIR/p${p}_k${k}_c${c}.log"
      echo "=== p=$p k=$k c=$c ==="
      python -m dflash_tpu.bench.cli \
        --model-name-or-path "$MODEL" --draft-name-or-path "$DRAFT" \
        --dataset "$DATASET" --max-samples "$MAX_SAMPLES" \
        --max-new-tokens "$MAX_NEW_TOKENS" \
        --mode candidates --candidate-mode "$CANDIDATE_MODE" \
        --fixed-prefix-len "$p" --branch-top-k "$k" --max-candidates "$c" \
        $EXTRA_ARGS > "$LOG" 2>&1 || { echo "$p,$k,$c,ERROR,,," >> "$CSV"; continue; }
      echo "$p,$k,$c,$(grab "$LOG" "Speculative TPOT:"),$(grab "$LOG" "Speculative tokens_per_sec:"),$(grab "$LOG" "Decoding speedup:"),$(grab "$LOG" "Average Acceptance length:")" >> "$CSV"
    done
  done
done
cat "$CSV"
