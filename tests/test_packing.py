"""Pack/unpack round-trip property tests (reference: noise.py RawPacker)."""

import jax.numpy as jnp
import numpy as onp
import pytest

from eld_tpu.core import packing


def test_bayer_roundtrip_numpy(rng):
    cfa = rng.random((64, 48), dtype=onp.float32)
    packed = packing.pack_bayer(cfa)
    assert packed.shape == (32, 24, 4)
    back = packing.unpack_bayer(packed)
    onp.testing.assert_array_equal(back, cfa)


def test_bayer_roundtrip_jnp(rng):
    cfa = rng.random((64, 48), dtype=onp.float32)
    packed = packing.pack_bayer(cfa, xp=jnp)
    back = packing.unpack_bayer(packed, xp=jnp)
    onp.testing.assert_array_equal(onp.asarray(back), cfa)


def test_bayer_matches_reference_order(rng):
    """Default offsets sample (0,0),(0,1),(1,1),(1,0) = R,G1,B,G2 for RGGB."""
    cfa = onp.arange(16, dtype=onp.float32).reshape(4, 4)
    packed = packing.pack_bayer(cfa)
    onp.testing.assert_array_equal(packed[0, 0], [0, 1, 5, 4])


def test_bayer_jnp_equals_numpy(rng):
    cfa = rng.random((32, 32), dtype=onp.float32)
    a = packing.pack_bayer(cfa)
    b = onp.asarray(packing.pack_bayer(cfa, xp=jnp))
    onp.testing.assert_array_equal(a, b)


def test_xtrans_roundtrip(rng):
    cfa = rng.random((36, 48), dtype=onp.float32)
    packed = packing.pack_xtrans(cfa)
    assert packed.shape == (12, 16, 9)
    back = packing.unpack_xtrans(packed)
    onp.testing.assert_array_equal(back, cfa)


def test_xtrans_jnp_equals_numpy(rng):
    cfa = rng.random((24, 24), dtype=onp.float32)
    a = packing.pack_xtrans(cfa)
    b = onp.asarray(packing.pack_xtrans(cfa, xp=jnp))
    onp.testing.assert_array_equal(a, b)


def test_xtrans_covers_every_pixel(rng):
    """Every mosaic position lands in exactly one output slot."""
    cfa = onp.arange(36 * 36, dtype=onp.float32).reshape(36, 36)
    packed = packing.pack_xtrans(cfa)
    assert sorted(packed.ravel().tolist()) == sorted(cfa.ravel().tolist())


def test_xtrans_pattern_canonical():
    """xtrans_pattern() (derived from the sampling maps) equals the known
    Fuji X-Trans layout the fixtures encode."""
    want = onp.array([0, 2, 1, 2, 0, 1,
                      1, 1, 0, 1, 1, 2,
                      1, 1, 2, 1, 1, 0,
                      2, 0, 1, 0, 2, 1,
                      1, 1, 2, 1, 1, 0,
                      1, 1, 0, 1, 1, 2], onp.uint8).reshape(6, 6)
    onp.testing.assert_array_equal(packing.xtrans_pattern(), want)


def test_normalize_bayer():
    packed = onp.full((4, 4, 4), 8191.5, dtype=onp.float32)
    black = onp.array([512, 512, 512, 512], dtype=onp.float32)
    out = packing.normalize_bayer(packed, black)
    onp.testing.assert_allclose(out, (8191.5 - 512) / (16383 - 512), rtol=1e-6)
    # clipping
    low = packing.normalize_bayer(onp.zeros((2, 2, 4), onp.float32), black)
    assert (low == 0).all()


def test_crop_center():
    img = onp.zeros((10, 20, 4), onp.float32)
    img[3:3 + 4, 8:8 + 4, :] = 1.0
    out = packing.crop_center(img, 4, 4)
    assert out.shape == (4, 4, 4)
    assert (out == 1.0).all()


def test_unpack_xtrans_jit_traceable(rng):
    """The module contract says every packer works under jit with
    xp=jnp; the X-Trans inverse used to round-trip through host NumPy
    and raise TracerArrayConversionError."""
    import jax

    cfa = rng.random((12, 24)).astype(onp.float32)
    packed = packing.pack_xtrans(cfa)
    back = jax.jit(lambda p: packing.unpack_xtrans(p, xp=jnp))(
        jnp.asarray(packed))
    onp.testing.assert_allclose(onp.asarray(back), cfa, rtol=1e-6)
