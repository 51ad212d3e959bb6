#!/usr/bin/env bash
# Training recipes (reference scripts/train.sh protocols, eld_tpu CLIs).
# Flagship: online synthetic-noise training, noise synthesized ON DEVICE
# inside the jitted train step (no offline baking penalty — the reference
# notes offline noise costs 0.1-0.3 dB).
set -e

# per-camera calibrated noise (include 1..4 = CanonEOS70D, CanonEOS700D,
# NikonD850, SonyA7S2)
for inc in 4 3 2 1; do
  python -m eld_tpu.tools.train_syn --name "sid-ours-inc${inc}" \
    --stage_in raw --stage_out raw --noise eld --include "${inc}" --bf16 "$@"
done

# paired real data
python -m eld_tpu.tools.train_real --name sid-paired \
  --stage_in raw --stage_out raw --bf16 "$@"

# raw -> sRGB pipeline (optionally with the calibrated SonyA7S2 CRF: --crf)
python -m eld_tpu.tools.train_real --name sid-paired-raw2rgb \
  --stage_in raw --stage_out srgb --bf16 "$@"
