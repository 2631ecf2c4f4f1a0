#!/usr/bin/env bash
# Train the round-5 fast-recipe quality rows on the real TPU chip
# (VERDICT r4 #1/#8: fast and correct must be the same config).
#
# The `--recipe fast` levers (sequence packing + factored-RMS embedding
# optimizer + bf16 Adam mu + scan-fused dispatch) are the `train` DEFAULT
# as of round 5; these runs prove the default's quality on real data:
#   1. 2A 10-fold + distillation  -> compare vs r4 distilled row 0.7217
#   2. 2C 8 seeds x 5 folds       -> family ensemble vs r4 headline 0.7332
#
# Usage: bin/run_fast_recipe_rows.sh [snapshot_dir]
#   Runs from a snapshot copy of the repo (so continued development in
#   /root/repo cannot break queued runs) but writes results into
#   /root/repo/runs/.  Strictly serial: one process owns the chip.
set -uo pipefail

REPO=/root/repo
SNAP=${1:-/tmp/mpmc_fast_rows_snapshot}
TRAIN=/root/reference/data/arabic_memes_propaganda_araieval_24_train.json
DEV=/root/reference/data/arabic_memes_propaganda_araieval_24_dev.json
LOG=/tmp/fast_rows

mkdir -p "$LOG"
if [ ! -d "$SNAP" ]; then
  mkdir -p "$SNAP"
  cp -r "$REPO/mpmc_tpu" "$REPO/native" "$REPO/pyproject.toml" "$SNAP/"
fi
cd "$SNAP"
# prepend (not replace): the TPU backend plugin is on the ambient PYTHONPATH
export PYTHONPATH="$SNAP${PYTHONPATH:+:$PYTHONPATH}"

run() {  # run <name> <args...>
  local name=$1; shift
  echo "=== $name: $* ==="
  if [ -f "$LOG/$name.done" ]; then echo "(already done)"; return 0; fi
  if python -m mpmc_tpu.cli.main "$@" > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
  else
    echo "FAILED: $name (see $LOG/$name.log)"
  fi
}

# 1. 2A fast recipe + distillation (10-fold over train+dev, r4 protocol).
run fast2a train --subtask 2a --small --epochs 40 --num-folds 10 \
  --batch-size 32 --lr 3e-4 --mlm-epochs 60 --distill-lambda 0.5 \
  -tr "$TRAIN" -te "$DEV" -o "$REPO/runs/fast_2a" \
  --cache-dir "$REPO/.cache"

# 2. 2C fast recipe, 8 seeds (r4 ens protocol: 5-fold, 20 epochs, bs16).
for s in 42 43 44 45 46 47 48 49; do
  run fast2c_s$s train --subtask 2c --small --epochs 20 --num-folds 5 \
    --batch-size 16 --lr 3e-4 --mlm-epochs 60 --seed $s \
    -tr "$TRAIN" -te "$DEV" -o "$REPO/runs/fens/s$s" \
    --cache-dir "$REPO/.cache"
done

echo "=== queue drained ==="
