"""Bilinear demosaic — XLA-native replacement for the LibRaw postprocess
path the reference uses to render saved previews
(``models/ELD_model.py:41-72``: write packed output back into the raw
buffer, then LibRaw demosaic + camera WB).

Two render paths:
  * half-size (LibRaw ``half_size=True``, what the reference's previews
    actually use): each 2x2 CFA cell -> one RGB pixel == the ISP
    ``binning`` path — use ``eld_tpu.core.isp.process``;
  * full-resolution bilinear demosaic (below) for ``half_size=False``
    quality, as a jittable conv stencil.

Input is the packed (H, W, 4) RGBG representation (already
black/white-normalized); output linear RGB at (2H, 2W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eld_tpu.core.packing import unpack_bayer


def _conv2(x, kernel):
    return jax.lax.conv_general_dilated(
        x[None, ..., None], kernel[..., None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, ..., 0]


def demosaic_bilinear(packed, offsets=((0, 0), (0, 1), (1, 1), (1, 0))):
    """(h, w, 4) packed RGBG -> (2h, 2w, 3) linear RGB, bilinear stencils.

    Classic bilinear CFA interpolation: green from the plus-shaped
    neighborhood, red/blue from the box neighborhood.
    """
    mosaic = unpack_bayer(packed, xp=jnp, offsets=offsets)
    H, W = mosaic.shape

    chan_at = {off: ch for ch, off in enumerate(offsets)}
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) % 2
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) % 2

    def mask_for(code):
        # code: 0=R, 1=G (either green), 2=B
        m = jnp.zeros((H, W), jnp.float32)
        for (r, c), ch in chan_at.items():
            is_code = (ch in (1, 3)) if code == 1 else (
                ch == 0 if code == 0 else ch == 2)
            if is_code:
                m = m + ((rows == r) & (cols == c)).astype(jnp.float32)
        return m

    k_plus = jnp.asarray([[0, 1, 0], [1, 4, 1], [0, 1, 0]], jnp.float32) / 4.0
    k_box = jnp.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]], jnp.float32) / 4.0

    out = []
    for code, kern in ((0, k_box), (1, k_plus), (2, k_box)):
        m = mask_for(code)
        num = _conv2(mosaic * m, kern)
        den = _conv2(m, kern)
        out.append(num / jnp.maximum(den, 1e-8))
    return jnp.stack(out, axis=-1)


def render_preview(packed, wb, ccm, gamma=2.2, half_size=True, crf=None):
    """Packed raw -> sRGB preview, mirroring the reference's saved-image
    path. half_size=True matches the released behavior exactly."""
    from eld_tpu.core import isp

    wb = jnp.asarray(wb, jnp.float32)
    wb = wb / wb[1]
    ccm = jnp.asarray(ccm, jnp.float32)[:3, :3]
    if half_size:
        return isp.process(packed[None], wb[None], ccm[None], gamma=gamma,
                           crf=crf)[0]
    rgb = demosaic_bilinear(jnp.clip(packed * wb.reshape(1, 1, 4), 0.0, 1.0))
    rgb = isp.apply_ccms(rgb[None], ccm[None])[0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    if crf is None:
        return isp.gamma_compression(rgb[None], gamma)[0]
    return isp.apply_crf(rgb[None], crf[0], crf[1])[0]
