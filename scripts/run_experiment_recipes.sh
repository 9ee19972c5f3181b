#!/usr/bin/env bash
# Canonical experiment recipes (reference run_experiment_recipes.sh):
# MODE-dispatched one-liners for the standard configurations.
set -euo pipefail

MODE=${1:-${MODE:-vanilla_bs16}}
MODEL=${MODEL:-tiny}
DRAFT=${DRAFT:-auto:1}
DATASET=${DATASET:-math500}
MAX_SAMPLES=${MAX_SAMPLES:-8}
MAX_NEW_TOKENS=${MAX_NEW_TOKENS:-256}
COMMON=(--model-name-or-path "$MODEL" --draft-name-or-path "$DRAFT"
        --dataset "$DATASET" --max-samples "$MAX_SAMPLES"
        --max-new-tokens "$MAX_NEW_TOKENS")

case "$MODE" in
  baseline_bs1)
    python -m dflash_tpu.bench.cli "${COMMON[@]}" --block-size 2 --skip-baseline ;;
  vanilla_bs16)
    python -m dflash_tpu.bench.cli "${COMMON[@]}" --block-size 16 ;;
  fixed_prefix_naive)
    python -m dflash_tpu.bench.cli "${COMMON[@]}" --mode candidates \
      --candidate-mode fixed_prefix_rank --fixed-prefix-len 2 \
      --branch-top-k 4 --max-candidates 4 ;;
  fixed_prefix_adaptive)
    python -m dflash_tpu.bench.cli "${COMMON[@]}" --mode candidates \
      --candidate-mode fixed_prefix_rank --fixed-prefix-len 2 \
      --branch-top-k 4 --max-candidates 4 --adaptive-candidates ;;
  sparse_conservative)
    python -m dflash_tpu.bench.cli "${COMMON[@]}" --mode candidates \
      --candidate-mode uncertainty_sparse_rank --fixed-prefix-len 2 \
      --branch-top-k 2 --max-candidates 2 --sparse-max-positions 2 ;;
  sparse_aggressive)
    python -m dflash_tpu.bench.cli "${COMMON[@]}" --mode candidates \
      --candidate-mode uncertainty_sparse_rank --fixed-prefix-len 1 \
      --branch-top-k 4 --max-candidates 6 --sparse-max-positions 4 ;;
  dynamic_ewma)
    python -m dflash_tpu.bench.cli "${COMMON[@]}" --mode dynamic \
      --dynamic-block-sizes 8,12,16 --scheduler-mode ewma ;;
  dynamic_adl)
    python -m dflash_tpu.bench.cli "${COMMON[@]}" --mode dynamic \
      --dynamic-block-sizes 8,12,16 --scheduler-mode adl_ewma ;;
  block_sweep)
    exec scripts/run_block_sweep.sh ;;
  multi_block)
    # several block sizes, ONE process / shared model load
    python -m dflash_tpu.bench.multi_block "${COMMON[@]}" \
      --block-sizes "${BLOCK_SIZES:-8,12,16}" ;;
  fixed_prefix_sweep)
    exec scripts/run_fixed_prefix_sweep.sh ;;
  *)
    echo "unknown MODE: $MODE" >&2
    echo "modes: baseline_bs1 vanilla_bs16 fixed_prefix_naive fixed_prefix_adaptive" >&2
    echo "       sparse_conservative sparse_aggressive dynamic_ewma dynamic_adl" >&2
    echo "       block_sweep multi_block fixed_prefix_sweep" >&2
    exit 2 ;;
esac
