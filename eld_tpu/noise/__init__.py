"""Physics-based raw noise formation model (the core IP), TPU-native.

The reference synthesizes noise per-patch with NumPy inside CPU DataLoader
workers (``noise.py:148-225``).  Here the whole model — parameter sampling
and noise application — is a pure jittable function over explicit
``jax.random`` keys, fused into the train step so synthesis runs on-device
and overlaps nothing (it *is* part of the step).

Noise model components (selected by a model string, reference chars kept):
  'P' exact Poisson shot noise          'p' Gaussian approx of shot noise
  'g' Gaussian read noise               'G' Tukey-lambda read noise
  'r' row noise                         'q' quantization noise
  'c' per-ISO per-channel color bias

Model aliases: "g"/"G" baselines, "Pg" (= paper "G+P"), "pg" (= "G+P*"),
and "eld" = 'PGrqc' (shot + Tukey-lambda read + row + quantization +
color bias) — the full ELD TPAMI model, implemented here from the
shipped calibration files even though the reference withholds the code
(``README.md:41``; params: ``camera_params/release/*_params.npy``).
"""

from eld_tpu.noise.params import (  # noqa: F401
    CameraParamsBank,
    NoiseParams,
    load_camera_params,
    sample_params,
    sample_params_batch,
    selected_cameras,
    CAMERA_NAMES,
    SATURATION_DEFAULT,
)
from eld_tpu.noise.model import apply_noise, synthesize, expand_model  # noqa: F401
