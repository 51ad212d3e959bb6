#!/usr/bin/env bash
# Four-camera ELD evaluation (reference scripts/test_ELD.sh): full-frame
# metrics with --chop tiled inference, per-camera calibrated models.
set -e
python -m eld_tpu.tools.test_eld --name sid-paired -r -re 200 --no-verbose --chop "$@"
for inc in 4 3 2 1; do
  python -m eld_tpu.tools.test_eld --name "sid-ours-inc${inc}" -r -re 200 \
    --no-verbose --include "${inc}" --chop "$@"
done
