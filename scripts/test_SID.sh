#!/usr/bin/env bash
# SID evaluation (reference scripts/test_SID.sh): 15 indoor scenes,
# center 512x512, illuminance-corrected raw-domain PSNR/SSIM.
set -e
python -m eld_tpu.tools.test_sid --name sid-paired -r -re 200 --no-verbose "$@"
python -m eld_tpu.tools.test_sid --name sid-ours-inc4 -r -re 200 --no-verbose "$@"
