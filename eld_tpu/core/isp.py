"""Differentiable raw -> sRGB ISP simulation, jit-native.

Pipeline (matches the reference protocol, ``util/process.py:52-68``):

    white balance -> clip -> RGBG binning -> color correction matrix
    -> clip -> gamma 1/2.2 (with 8-bit quantization) OR calibrated CRF

Everything is pure jax.numpy on channels-last batched images
(N, H, W, 4) raw -> (N, H, W, 3) sRGB, fully jittable and batchable —
the reference's per-image torchinterp1d loop (``util/process.py:71-83``)
becomes one vectorized ``jnp.interp`` gather.

The two 8-bit quantization points (``util/process.py:38`` and ``:82``) are
reproduced exactly: eval PSNR in sRGB space is sensitive to them.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_gains(raw, wb):
    """White balance. raw: (N, H, W, 4), wb: (N, 4) in RGBG channel order."""
    return raw * wb[:, None, None, :]


def binning(raw):
    """RGBG -> linear RGB by averaging the two green planes."""
    r = raw[..., 0]
    g = 0.5 * (raw[..., 1] + raw[..., 3])
    b = raw[..., 2]
    return jnp.stack([r, g, b], axis=-1)


def apply_ccms(rgb, ccm):
    """Color correction. rgb: (N, H, W, 3), ccm: (N, 3, 3) cam->sRGB.

    out[..., i] = sum_j rgb[..., j] * ccm[i, j]  (row-vector convention of
    the reference's ``apply_ccms``, ``util/process.py:22-31``).
    """
    return jnp.einsum("nhwj,nij->nhwi", rgb, ccm)


def quantize_8bit(img):
    """Simulate 8-bit output quantization: floor to int, clamp, back to [0,1].

    Mirrors ``torch.clamp((x*255).int(), 0, 255).float()/255`` — note torch's
    ``.int()`` truncates toward zero, so this is a floor for x >= 0.
    """
    q = jnp.clip(jnp.trunc(img * 255.0), 0.0, 255.0)
    return q / 255.0


def gamma_compression(img, gamma=2.2):
    """Linear -> gamma space with 8-bit quantization."""
    out = jnp.maximum(img, 1e-8) ** (1.0 / gamma)
    return quantize_8bit(out)


def apply_crf(img, crf_e, crf_fs):
    """Apply a camera response function by 1-D interpolation per channel.

    img: (N, H, W, 3) linear RGB in [0, 1]
    crf_e: (3, K) irradiance sample grid (typically shared across channels)
    crf_fs: (3, K) response values per channel

    Vectorized equivalent of the reference's per-image ``Interp1d`` loop;
    includes the same final 8-bit quantization (``util/process.py:82``).
    """
    outs = []
    for c in range(3):
        outs.append(jnp.interp(img[..., c], crf_e[c], crf_fs[c]))
    out = jnp.stack(outs, axis=-1)
    return quantize_8bit(out)


def process(raw, wb, ccm, gamma=2.2, crf=None):
    """Full batched raw(RGBG, NHWC) -> sRGB pipeline.

    raw: (N, H, W, 4) in [0, 1]; wb: (N, 4); ccm: (N, 3, 3).
    crf: optional (E, fs) pair of (3, K) arrays.
    """
    x = apply_gains(raw, wb)
    x = jnp.clip(x, 0.0, 1.0)
    x = binning(x)
    x = apply_ccms(x, ccm)
    x = jnp.clip(x, 0.0, 1.0)
    if crf is None:
        return gamma_compression(x, gamma)
    return apply_crf(x, crf[0], crf[1])


def raw2rgb(packed, wb, ccm, crf=None, gamma=2.2):
    """Single-image convenience wrapper: (H, W, 4) -> (H, W, 3)."""
    wb = jnp.asarray(wb, jnp.float32)
    wb = wb / wb[1]
    ccm = jnp.asarray(ccm, jnp.float32)[:3, :3]
    out = process(packed[None], wb[None], ccm[None], gamma=gamma, crf=crf)
    return out[0]
