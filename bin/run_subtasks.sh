#!/bin/sh
# Per-subtask run → format-check → score → package loop (reference
# bin/setup.sh:13-35 recipe, without poetry/data-download which this
# environment can't perform; point DATA_DIR at the ArAIEval data).
set -e
DATA_DIR="${DATA_DIR:-/root/reference/data}"
TRAIN="$DATA_DIR/arabic_memes_propaganda_araieval_24_train.json"
DEV="$DATA_DIR/arabic_memes_propaganda_araieval_24_dev.json"
OUT="${OUT:-outputs}"
mkdir -p "$OUT"

for SUB in 2a 2b 2c; do
  echo "=== subtask $SUB: baselines ==="
  python -m mpmc_tpu.cli.main baselines --subtask "$SUB" \
    -tr "$TRAIN" -te "$DEV" -o "$OUT"
done

for f in "$OUT"/*_baseline_*.tsv; do
  echo "=== check+score $f ==="
  python -m mpmc_tpu.cli.main check -p "$f"
  python -m mpmc_tpu.cli.main score -g "$DEV" -p "$f"
done

# package for submission (reference zips each TSV)
( cd "$OUT" && for f in *.tsv; do zip -q "${f%.tsv}.zip" "$f" 2>/dev/null || \
    tar czf "${f%.tsv}.tgz" "$f"; done )
echo "done; artifacts in $OUT"
