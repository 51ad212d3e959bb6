"""Property tests for the analytic steerable pyramid (ops/steerable.py).

The sp5Filters tap tables the reference's STRRED backend uses
(skvideo.measure.strred -> matlabPyrTools sp5Filters, consumed at
util/index.py:5,88) are unreachable offline, so the construction is
validated against the *defining properties* of the steerable pyramid
(Simoncelli & Freeman 1995): unit tight frame, exact steerability of the
order-5 angular windows, orientation and scale selectivity, and real
zero-mean output.
"""

import numpy as onp
import pytest

from eld_tpu.ops import steerable as st


def test_tight_frame_completeness():
    """Highpass residual + all oriented bands + lowpass residual tile the
    frequency plane with unit total power (the perfect-reconstruction /
    tight-frame identity of the pyramid)."""
    h, w = 64, 96
    r, theta = st._radial_grids(h, w)
    levels = 4
    total = st._highpass(0.5 * r) ** 2  # highpass residual (lo0 complement)
    for n in range(1, levels + 1):
        ang = sum(st._angular(theta, k, st.SP5_NBANDS) ** 2
                  for k in range(st.SP5_NBANDS))
        total = total + st._radial_band(r, n) ** 2 * ang
    low = st._lowpass(0.5 * r)  # lowpass residual below the last level
    for j in range(levels):
        low = low * st._lowpass((2.0 ** j) * r)
    total = total + low ** 2
    onp.testing.assert_allclose(total, 1.0, atol=1e-5)


def test_angular_power_normalization():
    """sum_k G_k(theta)^2 == 1 for every angle (the c_N constant)."""
    theta = onp.linspace(-onp.pi, onp.pi, 1001)
    s = sum(st._angular(theta, k, st.SP5_NBANDS) ** 2
            for k in range(st.SP5_NBANDS))
    onp.testing.assert_allclose(s, 1.0, atol=1e-10)


def test_steerability():
    """A band synthesized at an arbitrary angle phi is an exact linear
    combination of the K basis bands — cos^(K-1) spans a (2K-1 -> K)-dim
    rotation-invariant subspace, so K rotated copies interpolate any
    rotation.  Verified by least-squares on the actual frequency masks."""
    h, w = 32, 32
    r, theta = st._radial_grids(h, w)
    rad = st._radial_band(r, 2)
    basis = onp.stack(
        [(rad * st._angular(theta, k, st.SP5_NBANDS)).ravel()
         for k in range(st.SP5_NBANDS)], axis=1)
    phi = 0.37  # arbitrary steering angle, not a basis angle
    # steering target: the angular window rotated to phi
    target = (rad * st._angular(theta - phi, 0, st.SP5_NBANDS)).ravel()
    coef, res, *_ = onp.linalg.lstsq(basis, target, rcond=None)
    recon = basis @ coef
    err = onp.abs(recon - target).max()
    assert err < 1e-8, err


def test_band_real_zero_mean_and_shape():
    rng = onp.random.default_rng(0)
    x = rng.random((96, 128), dtype=onp.float32)
    band = onp.asarray(st.steerable_band(x, level=4, orientation=0))
    assert band.shape == (96 // 8, 128 // 8)
    assert band.dtype == onp.float32
    # DC is annihilated: response to a constant image is ~0
    flat = onp.asarray(st.steerable_band(onp.full((96, 128), 0.7,
                                                  onp.float32), level=4))
    assert onp.abs(flat).max() < 1e-5


def test_orientation_selectivity():
    """A grating oriented along basis angle theta_k lands its energy in
    band k, not in the orthogonal band."""
    h = w = 128
    yy, xx = onp.mgrid[0:h, 0:w].astype(onp.float64)
    f = onp.pi / 4.0  # radial frequency inside level-2's passband
    for k_true, (cy, cx) in enumerate(
            [(0.0, 1.0), (1.0, 0.0)]):  # horizontal-variation vs vertical
        grating = onp.cos(f * (cy * yy + cx * xx)).astype(onp.float32)
        energies = [
            float((onp.asarray(st.steerable_band(grating, level=2,
                                                 orientation=k)) ** 2).sum())
            for k in range(st.SP5_NBANDS)]
        # gradient along x (cx=1) => angle 0 => band 0; along y => band 3
        # (theta_k = pi k / 6; pi/2 is band 3)
        expect = 0 if cx == 1.0 else 3
        assert int(onp.argmax(energies)) == expect, (energies, k_true)
        assert energies[expect] > 10.0 * min(energies)


def test_scale_selectivity():
    """A radial frequency at pi/16 (level 4's passband center) responds
    strongest at level 4."""
    h = w = 256
    xx = onp.mgrid[0:h, 0:w][1].astype(onp.float64)
    grating = onp.cos((onp.pi / 16.0) * xx).astype(onp.float32)
    energy = {}
    for lvl in (3, 4, 5):
        b = onp.asarray(st.steerable_band(grating, level=lvl, orientation=0))
        energy[lvl] = float((b ** 2).mean())
    assert energy[4] > energy[3] and energy[4] > energy[5], energy


def test_validation_errors():
    x = onp.zeros((96, 128), onp.float32)
    with pytest.raises(ValueError, match="level"):
        st.steerable_band(x, level=0)
    with pytest.raises(ValueError, match="orientation"):
        st.steerable_band(x, orientation=6)
    with pytest.raises(ValueError, match="too small"):
        st.steerable_band(onp.zeros((16, 16), onp.float32), level=4)


def test_strred_uses_steerable_default():
    """The STRRED default extractor is the steerable band for full-size
    frames and still satisfies the metamorphic ordering."""
    from eld_tpu.ops.strred import _default_subband, isotropic_subband, strred

    rng = onp.random.default_rng(1)
    base = rng.random((4, 96, 128), dtype=onp.float32)
    base = 0.5 * (base + onp.roll(base, 1, axis=1))

    d = onp.asarray(_default_subband(base[0]))
    s_ref = onp.asarray(st.steerable_band(base[0], level=4, orientation=0))
    onp.testing.assert_allclose(d, s_ref, rtol=1e-6)

    # small frames fall back to the isotropic extractor
    small = base[0][:24, :24]
    onp.testing.assert_allclose(onp.asarray(_default_subband(small)),
                                onp.asarray(isotropic_subband(small)),
                                rtol=1e-6)

    scores = []
    for amp in (0.02, 0.3):
        noisy = onp.clip(base + rng.normal(0, amp, base.shape)
                         .astype(onp.float32), 0, 1)
        _, s, _ = strred(base, noisy)
        assert onp.isfinite(s) and s >= 0
        scores.append(s)
    assert scores[0] < scores[1]
    _, s0, sn0 = strred(base, base)
    assert s0 == pytest.approx(0.0, abs=1e-9)
