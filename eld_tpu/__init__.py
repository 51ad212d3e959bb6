"""eld_tpu — a TPU-native (JAX/XLA/Pallas) framework for physics-based
extreme low-light raw denoising.

Re-designed from scratch for TPU with the capabilities of the ELD reference
(Vandermode/ELD): a calibrated physics-based raw noise formation model, a
SID-style U-Net denoiser, raw→sRGB ISP simulation with EMoR radiometric
calibration, SID/ELD dataset pipelines and evaluation harnesses.

Design stance (differs from the CUDA/PyTorch reference on purpose):
  * everything on the compute path is a pure, jittable function — the noise
    model and ISP run **on device**, fused into the train step, instead of
    inside CPU DataLoader workers;
  * arrays are channels-last (NHWC) — the natural TPU layout;
  * parallelism is declarative: a `jax.sharding.Mesh` with `data` (batch DP)
    and `spatial` (halo-sharded full-frame eval) axes, with XLA emitting the
    collectives;
  * randomness is explicit `jax.random` key threading — no worker-reseed
    footguns;
  * the runtime around XLA (patch store, raw decode) is native C++ with
    ctypes bindings.
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml

from eld_tpu import core, noise, models, ops, parallel  # noqa: F401


def __getattr__(name):
    # heavy top-level conveniences, imported lazily
    if name == "Engine":
        from eld_tpu.train.engine import Engine

        return Engine
    if name == "Config":
        from eld_tpu.config import Config

        return Config
    if name == "build_arch":
        from eld_tpu.models import build_arch

        return build_arch
    if name in ("save_denoiser", "load_denoiser", "quantize_params",
                "dequantize_params"):
        from eld_tpu import export

        return getattr(export, name)
    raise AttributeError(f"module 'eld_tpu' has no attribute {name!r}")
