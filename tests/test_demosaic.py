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
