#!/usr/bin/env bash
# Full-eval launcher (reference run_benchmark.sh semantics): run the benchmark
# CLI over a task list, FAST mode for smoke runs, optional multi-process DP.
#
# Env:
#   MODEL   preset or checkpoint dir        (default: tiny)
#   DRAFT   checkpoint dir or auto:<layers> (default: auto:1)
#   FAST    1 => 256 new tokens, 8 samples, math-only task list
#   TASKS   space-separated dataset names   (default: full 11-task list)
#   BLOCK_SIZE, MAX_NEW_TOKENS, MAX_SAMPLES, TEMPERATURE, EXTRA_ARGS
#   OUT_DIR output directory                (default: results/)
set -euo pipefail

MODEL=${MODEL:-tiny}
DRAFT=${DRAFT:-auto:1}
FAST=${FAST:-0}
OUT_DIR=${OUT_DIR:-results}
TEMPERATURE=${TEMPERATURE:-0.0}
EXTRA_ARGS=${EXTRA_ARGS:-}

if [[ "$FAST" == "1" ]]; then
  TASKS=${TASKS:-"gsm8k math500"}
  MAX_NEW_TOKENS=${MAX_NEW_TOKENS:-256}
  MAX_SAMPLES=${MAX_SAMPLES:-8}
else
  TASKS=${TASKS:-"gsm8k math500 aime24 aime25 alpaca mt-bench humaneval mbpp lbpp livecodebench swe-bench"}
  MAX_NEW_TOKENS=${MAX_NEW_TOKENS:-2048}
  MAX_SAMPLES=${MAX_SAMPLES:-30}
fi

mkdir -p "$OUT_DIR"
for task in $TASKS; do
  echo "=== $task ==="
  python -m dflash_tpu.bench.cli \
    --model-name-or-path "$MODEL" \
    --draft-name-or-path "$DRAFT" \
    --dataset "$task" \
    --max-samples "$MAX_SAMPLES" \
    --max-new-tokens "$MAX_NEW_TOKENS" \
    --temperature "$TEMPERATURE" \
    ${BLOCK_SIZE:+--block-size "$BLOCK_SIZE"} \
    --save-outputs-path "$OUT_DIR/${task}.jsonl" \
    $EXTRA_ARGS \
    | tee "$OUT_DIR/${task}.log"
done
