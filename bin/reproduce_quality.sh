#!/usr/bin/env bash
# Reproduce the round-3 headline quality numbers on CPU in ~5 minutes.
#
# Uses the shipped neural fold TSVs (runs/ens/s42..s49 — 8 seeds x 5 folds,
# trained on the real TPU with corpus-MLM init, zero external weights) and
# refits the classic members from the raw manifests.  Every score is
# validated through the reference scorer (/root/reference/scorer/task2.py
# runs unmodified on our TSVs; our numpy scorer is float-exact to it).
#
# Expected output (dev macro-F1, reference scorer):
#   ngram word (README row)                     0.579
#   ngram char_wb single model                  0.683
#   family-balanced neural(40) + char(5), logit 0.7332   <- no gold-fit
#                                                           scalar beyond the
#                                                           shared threshold
#   + --scan-family-weight                      0.7467
#   reference shipped ensemble (own protocol)   0.7327
set -euo pipefail
cd "$(dirname "$0")/.."

TRAIN=/root/reference/data/arabic_memes_propaganda_araieval_24_train.json
DEV=/root/reference/data/arabic_memes_propaganda_araieval_24_dev.json
OUT=${1:-/tmp/mpmc_quality_repro}
mkdir -p "$OUT"

echo "== classic members (word parity row + char_wb family) =="
python -m mpmc_tpu.cli.main baselines --subtask 2c --skip-features \
  -tr "$TRAIN" -te "$DEV" -o "$OUT"
python -m mpmc_tpu.cli.main baselines --subtask 2c --skip-features \
  --ngram-analyzer char_wb --ngram-range 2 5 --ngram-max-features 30000 \
  --ngram-fold-probs 5 -tr "$TRAIN" -te "$DEV" -o "$OUT"

echo "== family-balanced ensemble (no gold-fit scalar beyond threshold) =="
python -m mpmc_tpu.cli.main combine --group-by-run-id --average logit \
  --metric macro --gold "$DEV" --out "$OUT/ensemble_fam_logit.tsv" \
  --files runs/ens/s4?/task2C_*_probs_fold_*.tsv \
          "$OUT"/ngram_char_wb_*_probs_fold_*.tsv

echo "== + gold-fit family weight scan =="
python -m mpmc_tpu.cli.main combine --scan-family-weight --average logit \
  --metric macro --gold "$DEV" --out "$OUT/ensemble_fam_logit_scan.tsv" \
  --files runs/ens/s4?/task2C_*_probs_fold_*.tsv \
          "$OUT"/ngram_char_wb_*_probs_fold_*.tsv

echo "== reference shipped ensemble under its own protocol, for context =="
python -m mpmc_tpu.cli.main combine --metric binary --gold "$DEV" \
  --out "$OUT/ref_ensemble.tsv" \
  --files /root/reference/task2C_kevinmathew_probs_fold_*.tsv

echo "== all three through the OFFICIAL reference scorer =="
for f in ensemble_fam_logit ensemble_fam_logit_scan ref_ensemble; do
  (cd /root/reference && python scorer/task2.py \
    -g data/arabic_memes_propaganda_araieval_24_dev.json \
    -p "$OUT/$f.tsv" 2>/dev/null | tail -1 | sed "s|^|$f: |")
done

echo "== 2A family-balanced per-fold ensemble (neural+MLM x char-ngram) =="
# Per-fold 50/50 family blend of the shipped 2A val-fold TSVs under the
# drivers' exact Youden rule (expected mean ~0.7147 vs 0.704 neural /
# 0.712 char alone).  The 10 folds partition train+dev, hence two golds.
total=0
for k in 0 1 2 3 4 5 6 7 8 9; do
  f1=$(python -m mpmc_tpu.cli.main combine --group-by-run-id \
    --metric youden --gold "$TRAIN" "$DEV" \
    --files runs/tuned_opt_2a/task2A_kevinmathew_probs_fold_$k.tsv \
            runs/chargram_2a/ngram_char_wb_cv_2A_val_fold_$k.tsv \
    | grep -oP 'youden-F1 \K[0-9.]+')
  echo "  fold $k: $f1"
  total=$(python -c "print($total + $f1)")
done
python -c "print('2A family ensemble 10-fold mean macro-F1:', round($total/10, 4))"

echo "== round-5 fast-recipe rows (the production \`train\` DEFAULT) =="
# `--recipe fast` = sequence packing + factored-RMS embedding optimizer +
# bf16 Adam mu + scan-fused dispatch.  runs/fast_2a was trained under that
# default with the r4 distillation protocol (40 ep, 10-fold over train+dev,
# MLM 60, distill-lambda 0.5); expected mean 0.7264 — above the r4 unpacked
# distilled row (0.7217) and the char-n-gram teacher (0.712): fast and
# correct are the same config.
total=0
for k in 0 1 2 3 4 5 6 7 8 9; do
  f1=$(python -m mpmc_tpu.cli.main combine --metric youden \
    --gold "$TRAIN" "$DEV" \
    --files runs/fast_2a/task2A_kevinmathew_probs_fold_$k.tsv \
    | grep -oP 'youden-F1 \K[0-9.]+')
  total=$(python -c "print($total + $f1)")
done
python -c "print('fast-recipe 2A 10-fold mean macro-F1:', round($total/10, 4))"

echo "== round-5 fast-recipe 2C family rows (packed members, runs/fens) =="
# 8 seeds x 5 folds retrained under the production default (`--recipe
# fast`: --pack-rows 8 + factored + bf16 mu + scan x8), same protocol as
# runs/ens otherwise.  Expected (reference-scorer F1):
#   family-balanced logit ensemble   0.7241  (plain members: 0.7332 — the
#                                             published headline keeps them)
#   + --scan-family-weight           0.7312
#   8-seed neural-only logit         0.7004  (plain members: 0.696)
# Per-seed 5-fold ensemble mean 0.6822 vs unpacked sequential 0.6796 —
# the packed fast recipe matches unpacked quality seed-for-seed.
python -m mpmc_tpu.cli.main combine --group-by-run-id --average logit \
  --metric macro --gold "$DEV" --out "$OUT/fens_fam_logit.tsv" \
  --files runs/fens/s4?/task2C_*_probs_fold_*.tsv \
          "$OUT"/ngram_char_wb_*_probs_fold_*.tsv
python -m mpmc_tpu.cli.main combine --average logit --metric macro \
  --gold "$DEV" --out "$OUT/fens_neural.tsv" \
  --files runs/fens/s4?/task2C_*_probs_fold_*.tsv
for f in fens_fam_logit fens_neural; do
  (cd /root/reference && python scorer/task2.py \
    -g data/arabic_memes_propaganda_araieval_24_dev.json \
    -p "$OUT/$f.tsv" 2>/dev/null | tail -1 | sed "s|^|$f: |")
done
