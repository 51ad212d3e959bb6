"""ISP pipeline tests (reference protocol: util/process.py:15-83)."""

import jax.numpy as jnp
import numpy as onp
import pytest
from scipy.interpolate import interp1d

from eld_tpu.core import isp
from eld_tpu.core.emor import load_crf, read_emor, fit_emor_coeffs


def test_apply_gains():
    raw = jnp.ones((1, 4, 4, 4))
    wb = jnp.asarray([[2.0, 1.0, 1.5, 1.0]])
    out = isp.apply_gains(raw, wb)
    onp.testing.assert_allclose(onp.asarray(out[0, 0, 0]), [2.0, 1.0, 1.5, 1.0])


def test_binning_green_mean(rng):
    raw = jnp.asarray(rng.random((1, 4, 4, 4), dtype=onp.float32))
    rgb = onp.asarray(isp.binning(raw))
    onp.testing.assert_allclose(rgb[..., 1], onp.asarray(raw[..., 1] + raw[..., 3]) / 2, rtol=1e-6)
    onp.testing.assert_array_equal(rgb[..., 0], onp.asarray(raw[..., 0]))
    onp.testing.assert_array_equal(rgb[..., 2], onp.asarray(raw[..., 2]))


def test_apply_ccms_row_convention(rng):
    rgb = jnp.asarray(rng.random((1, 2, 2, 3), dtype=onp.float32))
    ccm = jnp.asarray(rng.random((1, 3, 3), dtype=onp.float32))
    out = onp.asarray(isp.apply_ccms(rgb, ccm))
    want = onp.einsum("nhwj,nij->nhwi", onp.asarray(rgb), onp.asarray(ccm))
    onp.testing.assert_allclose(out, want, rtol=1e-5)


def test_gamma_quantization():
    img = jnp.asarray([[[[0.5, 0.5, 0.5]]]])
    out = float(isp.gamma_compression(img)[0, 0, 0, 0])
    manual = onp.floor((0.5 ** (1 / 2.2)) * 255) / 255
    assert out == pytest.approx(manual, abs=1e-7)
    # quantization leaves only 8-bit levels
    x = jnp.linspace(0, 1, 1000).reshape(1, 10, 100, 1).repeat(3, -1)
    q = onp.asarray(isp.quantize_8bit(x))
    assert set(onp.unique(onp.round(q * 255)).astype(int)) <= set(range(256))


def test_crf_interp_matches_scipy(rng):
    """Mirror of the reference's EMoR/test_EMoR.py consistency check:
    our vectorized jnp.interp CRF vs scipy interp1d per channel."""
    E, fs = load_crf()
    img = rng.random((2, 16, 16, 3), dtype=onp.float32)
    got = onp.asarray(isp.apply_crf(jnp.asarray(img), jnp.asarray(E), jnp.asarray(fs)))
    want = onp.stack(
        [interp1d(E[c], fs[c])(img[..., c]) for c in range(3)], axis=-1
    )
    want = onp.clip(onp.trunc(want * 255), 0, 255) / 255
    onp.testing.assert_allclose(got, want, atol=1e-5)


def test_full_process_pipeline(rng):
    raw = jnp.asarray(rng.random((2, 8, 8, 4), dtype=onp.float32))
    wb = jnp.asarray(onp.tile([[1.9, 1.0, 1.6, 1.0]], (2, 1)).astype(onp.float32))
    ccm = jnp.asarray(onp.tile(onp.eye(3, dtype=onp.float32)[None], (2, 1, 1)))
    out = isp.process(raw, wb, ccm)
    assert out.shape == (2, 8, 8, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    # with CRF
    E, fs = load_crf()
    out2 = isp.process(raw, wb, ccm, crf=(jnp.asarray(E), jnp.asarray(fs)))
    assert out2.shape == (2, 8, 8, 3)


def test_emor_basis_shapes():
    E, f0, hs = read_emor()
    assert E.shape == (1024,) and f0.shape == (1024,) and hs.shape == (25, 1024)
    assert E[0] == 0 and abs(E[-1] - 1) < 1e-5


def test_crf_shapes():
    E, fs = load_crf()
    assert E.shape == (3, 1024) and fs.shape == (3, 1024)


def test_fit_emor_recovers_coeffs():
    E, f0, hs = read_emor()
    true_c = onp.array([0.5, -0.2, 0.1, 0.05, -0.02], onp.float32)
    curve = f0 + true_c @ hs[:5]
    x = E[::50]
    y = onp.interp(x, E, curve)
    coeffs, f_est = fit_emor_coeffs(x, y, num_coeffs=5)
    onp.testing.assert_allclose(coeffs, true_c, atol=2e-2)
    assert onp.abs(f_est - curve).max() < 1e-2
