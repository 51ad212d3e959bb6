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


def _conv2_reflect(x, kernel):
    """5x5 conv with reflect padding (no dark borders)."""
    k = kernel.shape[0] // 2
    xp = jnp.pad(x, ((k, k), (k, k)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp[None, ..., None], kernel[..., None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, ..., 0]


# Malvar-He-Cutler gradient-corrected linear filters (ICASSP 2004), x8.
_MHC_G = jnp.asarray(  # G at an R or B site
    [[0, 0, -1, 0, 0],
     [0, 0, 2, 0, 0],
     [-1, 2, 4, 2, -1],
     [0, 0, 2, 0, 0],
     [0, 0, -1, 0, 0]], jnp.float32) / 8.0
_MHC_ROW = jnp.asarray(  # R/B at a G site whose same-color row neighbors match
    [[0, 0, 0.5, 0, 0],
     [0, -1, 0, -1, 0],
     [-1, 4, 5, 4, -1],
     [0, -1, 0, -1, 0],
     [0, 0, 0.5, 0, 0]], jnp.float32) / 8.0
_MHC_COL = _MHC_ROW.T  # same-color neighbors in the column
_MHC_X = jnp.asarray(  # R at a B site / B at an R site
    [[0, 0, -1.5, 0, 0],
     [0, 2, 0, 2, 0],
     [-1.5, 0, 6, 0, -1.5],
     [0, 2, 0, 2, 0],
     [0, 0, -1.5, 0, 0]], jnp.float32) / 8.0


def demosaic_mhc(packed, offsets=((0, 0), (0, 1), (1, 1), (1, 0))):
    """(h, w, 4) packed RGBG -> (2h, 2w, 3) via Malvar-He-Cutler.

    The gradient-corrected linear demosaic (4 fixed 5x5 stencils applied to
    the raw mosaic + per-phase selection) — entirely convolutions, so it
    runs on the MXU; the jittable stand-in for LibRaw's full-quality
    ``postprocess()`` demosaic the reference uses when saving previews
    (``models/ELD_model.py:41-72``).
    """
    mosaic = unpack_bayer(packed, xp=jnp, offsets=offsets)
    H, W = mosaic.shape
    (rr, rc), g1, (br, bc), g2 = offsets

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) % 2
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) % 2
    at = lambda rc_: ((rows == rc_[0]) & (cols == rc_[1])).astype(jnp.float32)

    c_g = _conv2_reflect(mosaic, _MHC_G)
    c_row = _conv2_reflect(mosaic, _MHC_ROW)
    c_col = _conv2_reflect(mosaic, _MHC_COL)
    c_x = _conv2_reflect(mosaic, _MHC_X)

    m_r, m_b, m_g1, m_g2 = at((rr, rc)), at((br, bc)), at(g1), at(g2)
    G = mosaic * (m_g1 + m_g2) + c_g * (m_r + m_b)
    # R at a green site: K_ROW if that green shares the R row parity
    r_g1 = c_row if g1[0] == rr else c_col
    r_g2 = c_row if g2[0] == rr else c_col
    R = mosaic * m_r + r_g1 * m_g1 + r_g2 * m_g2 + c_x * m_b
    b_g1 = c_row if g1[0] == br else c_col
    b_g2 = c_row if g2[0] == br else c_col
    B = mosaic * m_b + b_g1 * m_g1 + b_g2 * m_g2 + c_x * m_r
    return jnp.stack([R, G, B], axis=-1)


def render_preview(packed, wb, ccm, gamma=2.2, half_size=True, crf=None,
                   demosaic: str = "mhc"):
    """Packed raw -> sRGB preview, mirroring the reference's saved-image
    path. half_size=True matches the released behavior exactly; full-res
    uses Malvar-He-Cutler by default (demosaic="bilinear" for the cheap
    stencil)."""
    from eld_tpu.core import isp

    wb = jnp.asarray(wb, jnp.float32)
    wb = wb / wb[1]
    ccm = jnp.asarray(ccm, jnp.float32)[:3, :3]
    if half_size:
        return isp.process(packed[None], wb[None], ccm[None], gamma=gamma,
                           crf=crf)[0]
    fn = demosaic_mhc if demosaic == "mhc" else demosaic_bilinear
    rgb = fn(jnp.clip(packed * wb.reshape(1, 1, 4), 0.0, 1.0))
    rgb = isp.apply_ccms(rgb[None], ccm[None])[0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    if crf is None:
        return isp.gamma_compression(rgb[None], gamma)[0]
    return isp.apply_crf(rgb[None], crf[0], crf[1])[0]
