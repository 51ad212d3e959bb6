"""Calibrated camera noise parameters + on-device parameter sampling.

Loads the per-camera calibration files (``camera_params/release/*.npy`` in
the reference; vendored under ``data_files/camera_params``) into a stacked,
vmappable bank, and samples per-patch noise parameters with ``jax.random``.

Sampling semantics are faithful to the reference (``noise.py:201-225``):
  * camera ~ uniform over the selected set
  * saturation_level = 16383 - 800
  * log K ~ U(log 0.1, log 30)        [mode="overridden", reference default
                                       which overrides calibrated Kmin/Kmax]
    or  ~ U(log Kmin, log Kmax)       [mode="calibrated"]
  * log scale_x = eps*sigma_x + slope_x*logK + bias_x for x in {g, G, R}
    (the calibrated log-linear K <-> scale relationships; the reference
    only consumes 'g', we also sample the shipped 'G' (Tukey-lambda read)
    and 'R' (row) profiles)
  * ratio ~ U(100, 300)
  * iso index ~ uniform over the 18 calibrated ISO settings, selecting the
    Tukey-lambda shape ``G_shape[iso]`` and ``color_bias[iso]``

jax.random is not bit-compatible with NumPy's MT19937, so parity with the
reference is statistical (tests assert distribution moments); for exact
replay, every consumer accepts explicit parameter pytrees (mirroring the
``params=`` override at ``noise.py:150-153``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as onp
from flax import struct

CAMERA_NAMES = ("CanonEOS5D4", "CanonEOS70D", "CanonEOS700D", "NikonD850", "SonyA7S2")
SATURATION_DEFAULT = 16383.0 - 800.0  # noise.py:205
N_ISO = 18

_PARAM_DIR = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "data_files", "camera_params"
)


@struct.dataclass
class CameraParamsBank:
    """Stacked calibration data for a set of cameras (a jit-able pytree).

    Shapes: scalars per camera (C,), per-ISO arrays (C, 18[, 4]).
    """

    kmin: jnp.ndarray          # (C,) system gain range
    kmax: jnp.ndarray          # (C,)
    g_slope: jnp.ndarray       # (C,) Gaussian read-noise log-linear profile
    g_bias: jnp.ndarray
    g_sigma: jnp.ndarray
    G_slope: jnp.ndarray       # (C,) Tukey-lambda read-noise scale profile
    G_bias: jnp.ndarray
    G_sigma: jnp.ndarray
    R_slope: jnp.ndarray       # (C,) row-noise scale profile
    R_bias: jnp.ndarray
    R_sigma: jnp.ndarray
    g_shape: jnp.ndarray       # (C, 18) per-ISO Tukey-lambda shape values
    color_bias: jnp.ndarray    # (C, 18, 4) per-ISO per-channel bias (DN)
    n_iso: jnp.ndarray         # (C,) number of REAL calibrated ISO settings
                               # (rows beyond n_iso[c] are edge padding)

    @property
    def num_cameras(self):
        return self.kmin.shape[0]


def _select(names, include=None, exclude=None):
    names = list(names)
    assert include is None or exclude is None
    if include is not None:
        names = [names[include]]
    elif exclude is not None:
        skip = names[exclude]
        names = [n for n in names if n != skip]
    return names


def load_camera_params(
    cameras: Optional[Sequence[str]] = None,
    include: Optional[int] = None,
    exclude: Optional[int] = None,
    param_dir: Optional[str] = None,
) -> CameraParamsBank:
    """Load calibration .npy files into a stacked bank.

    include/exclude are indices into the camera list, matching the
    reference CLI semantics (``noise.py:181-185``).
    """
    names = _select(cameras or CAMERA_NAMES, include, exclude)
    param_dir = param_dir or _PARAM_DIR
    cols = {k: [] for k in (
        "kmin", "kmax", "g_slope", "g_bias", "g_sigma", "G_slope", "G_bias",
        "G_sigma", "R_slope", "R_bias", "R_sigma", "g_shape", "color_bias",
        "n_iso")}
    for name in names:
        raw = onp.load(os.path.join(param_dir, f"{name}_params.npy"), allow_pickle=True).item()
        prof = raw["Profile-1"]
        cols["kmin"].append(raw["Kmin"])
        cols["kmax"].append(raw["Kmax"])
        for tag, key in (("g", "g_scale"), ("G", "G_scale"), ("R", "R_scale")):
            cols[f"{tag}_slope"].append(prof[key]["slope"])
            cols[f"{tag}_bias"].append(prof[key]["bias"])
            cols[f"{tag}_sigma"].append(prof[key]["sigma"])
        g_shape = onp.asarray(raw["G_shape"], dtype=onp.float32)
        cb = onp.asarray(raw["color_bias"], dtype=onp.float32)
        # Some cameras calibrate fewer ISO settings (16 vs 18); edge-pad so
        # the bank stacks, and record the real count — sampling draws
        # iso ~ U[0, n_iso[camera]) so padding rows are never selected.
        # Clamp to N_ISO too: _pad_rows TRUNCATES longer files, and an
        # unclamped count would make the gather silently oversample the
        # last stored row (and diverge from the untruncated host path).
        cols["n_iso"].append(min(len(g_shape), cb.shape[0], N_ISO))
        cols["g_shape"].append(_pad_rows(g_shape[:, None], N_ISO)[:, 0])
        cols["color_bias"].append(_pad_rows(cb, N_ISO))
    arrs = {
        k: jnp.asarray(onp.stack(v).astype(onp.int32 if k == "n_iso" else onp.float32))
        for k, v in cols.items()
    }
    return CameraParamsBank(**arrs)


def selected_cameras(cameras=None, include=None, exclude=None):
    """Camera names a bank built with the same arguments contains."""
    return tuple(_select(cameras or CAMERA_NAMES, include, exclude))


def _pad_rows(a: onp.ndarray, n: int) -> onp.ndarray:
    if a.shape[0] >= n:
        return a[:n]
    pad = onp.repeat(a[-1:], n - a.shape[0], axis=0)
    return onp.concatenate([a, pad], axis=0)


@struct.dataclass
class NoiseParams:
    """Per-sample noise parameters (all scalars; batched via vmap)."""

    K: jnp.ndarray                 # system gain (DN/e-)
    g_scale: jnp.ndarray           # Gaussian read-noise scale (DN)
    G_scale: jnp.ndarray           # Tukey-lambda read-noise scale (DN)
    G_shape: jnp.ndarray           # Tukey-lambda shape (lambda)
    R_scale: jnp.ndarray           # row-noise scale (DN)
    color_bias: jnp.ndarray        # (4,) per-channel bias (DN)
    saturation_level: jnp.ndarray  # white_point - black_level
    ratio: jnp.ndarray             # exposure amplification


def sample_params(
    key: jax.Array,
    bank: CameraParamsBank,
    k_mode: str = "overridden",
    ratio_range=(100.0, 300.0),
    saturation_level: float = SATURATION_DEFAULT,
) -> NoiseParams:
    """Sample one NoiseParams pytree. vmap over split keys for a batch."""
    k_cam, k_K, k_g, k_G, k_R, k_iso, k_ratio = jax.random.split(key, 7)
    cam = jax.random.randint(k_cam, (), 0, bank.num_cameras)

    if k_mode == "overridden":
        log_k_lo = jnp.log(1e-1)
        log_k_hi = jnp.log(30.0)
    elif k_mode == "calibrated":
        log_k_lo = jnp.log(bank.kmin[cam])
        log_k_hi = jnp.log(bank.kmax[cam])
    else:
        raise ValueError(f"unknown k_mode {k_mode!r}")
    log_K = jax.random.uniform(k_K, (), minval=log_k_lo, maxval=log_k_hi)

    def scale(k, slope, bias, sigma):
        return jnp.exp(jax.random.normal(k, ()) * sigma[cam] + slope[cam] * log_K + bias[cam])

    g_scale = scale(k_g, bank.g_slope, bank.g_bias, bank.g_sigma)
    G_scale = scale(k_G, bank.G_slope, bank.G_bias, bank.G_sigma)
    R_scale = scale(k_R, bank.R_slope, bank.R_bias, bank.R_sigma)

    iso = jax.random.randint(k_iso, (), 0, bank.n_iso[cam])
    ratio = jax.random.uniform(k_ratio, (), minval=ratio_range[0], maxval=ratio_range[1])

    return NoiseParams(
        K=jnp.exp(log_K),
        g_scale=g_scale,
        G_scale=G_scale,
        G_shape=bank.g_shape[cam, iso],
        R_scale=R_scale,
        color_bias=bank.color_bias[cam, iso],
        saturation_level=jnp.asarray(saturation_level, jnp.float32),
        ratio=ratio,
    )


def sample_params_batch(key, bank, batch_size, **kw) -> NoiseParams:
    keys = jax.random.split(key, batch_size)
    return jax.vmap(lambda k: sample_params(k, bank, **kw))(keys)
