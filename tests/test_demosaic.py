"""Bilinear demosaic tests."""

import jax.numpy as jnp
import numpy as onp
import pytest

from eld_tpu.core.demosaic import demosaic_bilinear, render_preview


def test_constant_field_exact(rng):
    """A flat color field must demosaic exactly (bilinear is exact on
    constants)."""
    packed = onp.zeros((8, 8, 4), onp.float32)
    packed[..., 0] = 0.7  # R
    packed[..., 1] = 0.4  # G1
    packed[..., 3] = 0.4  # G2
    packed[..., 2] = 0.2  # B
    rgb = onp.asarray(demosaic_bilinear(jnp.asarray(packed)))
    assert rgb.shape == (16, 16, 3)
    onp.testing.assert_allclose(rgb[..., 0], 0.7, atol=1e-6)
    onp.testing.assert_allclose(rgb[..., 1], 0.4, atol=1e-6)
    onp.testing.assert_allclose(rgb[..., 2], 0.2, atol=1e-6)


def test_linear_ramp_interpolated(rng):
    """Bilinear demosaic reproduces linear gradients away from borders."""
    H = W = 16
    ramp = onp.linspace(0, 1, 2 * W, dtype=onp.float32)
    mosaic = onp.tile(ramp, (2 * H, 1))
    from eld_tpu.core.packing import pack_bayer

    packed = pack_bayer(mosaic)
    rgb = onp.asarray(demosaic_bilinear(jnp.asarray(packed)))
    interior = rgb[4:-4, 4:-4, :]
    want = onp.tile(ramp, (2 * H, 1))[4 : 2 * H - 4, 4 : 2 * W - 4]
    for c in range(3):
        onp.testing.assert_allclose(interior[..., c], want, atol=1e-5)


def test_render_preview_paths(rng):
    packed = rng.random((16, 16, 4), dtype=onp.float32)
    wb = onp.array([1.9, 1.0, 1.6, 1.0], onp.float32)
    ccm = onp.eye(3, dtype=onp.float32)
    half = render_preview(jnp.asarray(packed), wb, ccm, half_size=True)
    full = render_preview(jnp.asarray(packed), wb, ccm, half_size=False)
    assert half.shape == (16, 16, 3)
    assert full.shape == (32, 32, 3)
    assert float(full.min()) >= 0 and float(full.max()) <= 1


def test_mhc_constant_and_ramp():
    """Malvar-He-Cutler is exact on constants and linear gradients (the
    gradient-correction terms cancel on affine signals)."""
    from eld_tpu.core.demosaic import demosaic_mhc
    from eld_tpu.core.packing import pack_bayer

    packed = onp.zeros((8, 8, 4), onp.float32)
    packed[..., 0], packed[..., 1], packed[..., 3], packed[..., 2] = .7, .4, .4, .2
    rgb = onp.asarray(demosaic_mhc(jnp.asarray(packed)))
    onp.testing.assert_allclose(rgb[..., 0], 0.7, atol=1e-6)
    onp.testing.assert_allclose(rgb[..., 1], 0.4, atol=1e-6)
    onp.testing.assert_allclose(rgb[..., 2], 0.2, atol=1e-6)

    H = W = 16
    ramp = onp.linspace(0, 1, 2 * W, dtype=onp.float32)
    mosaic = onp.tile(ramp, (2 * H, 1))
    rgb = onp.asarray(demosaic_mhc(jnp.asarray(pack_bayer(mosaic))))
    want = onp.tile(ramp, (2 * H, 1))[4:-4, 4:-4]
    for c in range(3):
        onp.testing.assert_allclose(rgb[4:-4, 4:-4, c], want, atol=1e-5)


def test_mhc_beats_bilinear_on_edges(rng):
    """On a structured scene (sharp luminance edges), the gradient-corrected
    demosaic must out-PSNR plain bilinear — the reason the reference uses
    LibRaw's full-quality demosaic for saved previews."""
    from eld_tpu.core.demosaic import demosaic_mhc
    from eld_tpu.core.packing import pack_bayer

    H = W = 64
    yy, xx = onp.mgrid[0:H, 0:W] / H
    # channel-CORRELATED edges (MHC's design assumption, true of real
    # scenes): one sharp luminance field scaled per channel
    lum = (0.25 + 0.5 * (onp.sin(11 * xx) > 0) * (onp.sin(7 * yy + 1) > 0)
           + 0.15 * xx).astype(onp.float32)
    gains = onp.array([0.9, 1.0, 0.7], onp.float32)
    bias = onp.array([0.05, 0.02, 0.1], onp.float32)
    truth = lum[..., None] * gains + bias
    mosaic = onp.zeros((H, W), onp.float32)
    mosaic[0::2, 0::2] = truth[0::2, 0::2, 0]   # R
    mosaic[0::2, 1::2] = truth[0::2, 1::2, 1]   # G1
    mosaic[1::2, 0::2] = truth[1::2, 0::2, 1]   # G2
    mosaic[1::2, 1::2] = truth[1::2, 1::2, 2]   # B
    packed = pack_bayer(mosaic)

    def psnr(a, b):
        mse = onp.mean((a - b) ** 2)
        return 10 * onp.log10(1.0 / mse)

    interior = slice(4, -4)
    p_mhc = psnr(onp.asarray(demosaic_mhc(jnp.asarray(packed)))[interior, interior],
                 truth[interior, interior])
    p_bil = psnr(onp.asarray(demosaic_bilinear(jnp.asarray(packed)))[interior, interior],
                 truth[interior, interior])
    assert p_mhc > p_bil + 0.5, (p_mhc, p_bil)


def test_mhc_grbg_offsets(rng):
    """MHC handles non-RGGB phase via explicit offsets."""
    from eld_tpu.core.demosaic import demosaic_mhc

    packed = onp.zeros((8, 8, 4), onp.float32)
    packed[..., 0], packed[..., 1], packed[..., 3], packed[..., 2] = .6, .5, .5, .1
    offsets = ((0, 1), (0, 0), (1, 0), (1, 1))  # GRBG: R at (0,1), B at (1,0)
    rgb = onp.asarray(demosaic_mhc(jnp.asarray(packed), offsets=offsets))
    onp.testing.assert_allclose(rgb[..., 0], 0.6, atol=1e-6)
    onp.testing.assert_allclose(rgb[..., 1], 0.5, atol=1e-6)
    onp.testing.assert_allclose(rgb[..., 2], 0.1, atol=1e-6)
