"""PSNR/SSIM parity vs an independent NumPy/SciPy implementation of the
skimage algorithms the reference evaluates with (util/index.py:76-81)."""

import numpy as onp
import pytest
from scipy.ndimage import uniform_filter

from eld_tpu.ops.metrics import psnr, ssim, quality_assess


def ref_psnr(x, y, data_range=255.0):
    mse = onp.mean((x.astype(onp.float64) - y.astype(onp.float64)) ** 2)
    return 10 * onp.log10(data_range**2 / mse)


def ref_ssim_single(x, y, data_range=255.0, win=7, k1=0.01, k2=0.03):
    """skimage.structural_similarity defaults, one channel."""
    x = x.astype(onp.float64)
    y = y.astype(onp.float64)
    NP = win**2
    cov_norm = NP / (NP - 1)
    f = lambda a: uniform_filter(a, size=win)
    ux, uy = f(x), f(y)
    uxx, uyy, uxy = f(x * x), f(y * y), f(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win - 1) // 2
    return s[pad:-pad, pad:-pad].mean()


def ref_ssim(x, y, data_range=255.0):
    return onp.mean([ref_ssim_single(x[..., c], y[..., c], data_range)
                     for c in range(x.shape[-1])])


@pytest.mark.parametrize("shape", [(64, 64, 4), (48, 80, 3)])
def test_psnr_matches(rng, shape):
    x = rng.random(shape) * 255
    y = onp.clip(x + rng.normal(0, 12, shape), 0, 255)
    got = float(psnr(x.astype(onp.float32), y.astype(onp.float32)))
    want = ref_psnr(x.astype(onp.float32), y.astype(onp.float32))
    assert abs(got - want) < 1e-3


@pytest.mark.parametrize("shape", [(64, 64, 4), (48, 80, 3)])
def test_ssim_matches(rng, shape):
    x = rng.random(shape) * 255
    y = onp.clip(x + rng.normal(0, 25, shape), 0, 255)
    got = float(ssim(x.astype(onp.float32), y.astype(onp.float32)))
    want = ref_ssim(x.astype(onp.float32), y.astype(onp.float32))
    assert abs(got - want) < 1e-4


def test_identical_images():
    x = onp.random.default_rng(0).random((32, 32, 4)).astype(onp.float32) * 255
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    res = quality_assess(x, x + 1.0)
    assert res["PSNR"] == pytest.approx(48.13, abs=0.01)  # 20log10(255/1)


def test_video_quality_assess(rng):
    from eld_tpu.ops.metrics import quality_assess_video

    x = rng.random((3, 32, 32, 4)).astype(onp.float32) * 255
    y = onp.clip(x + rng.normal(0, 10, x.shape), 0, 255).astype(onp.float32)
    res = quality_assess_video(x, y)
    want = onp.mean([ref_psnr(x[t], y[t]) for t in range(3)])
    assert res["PSNR"] == pytest.approx(want, abs=1e-3)
    assert 0 < res["SSIM"] <= 1


def test_ncc_and_local_error(rng):
    from eld_tpu.ops.metrics import compare_ncc, local_error

    x = rng.random((16, 16)).astype(onp.float32)
    assert float(compare_ncc(x, x)) == pytest.approx(1.0, abs=1e-5)
    assert abs(float(compare_ncc(x, -x)) + 1.0) < 1e-5

    img = rng.random((24, 24, 3)).astype(onp.float32)
    # estimate = 2x correct -> local rescale makes the error ~0
    err = float(local_error(img, img * 2.0, 8, 8))
    assert err < 1e-10


def test_raw2gray(rng):
    from eld_tpu.ops.metrics import raw2gray

    x = onp.ones((2, 8, 8, 4), onp.float32)
    g = raw2gray(x)
    assert g.shape == (2, 8, 8)
    onp.testing.assert_allclose(onp.asarray(g), 1.0, rtol=1e-5)


def test_strred_properties(rng):
    """Metamorphic validation of the from-the-paper ST-RRED (skvideo, the
    reference's backend, is absent/unmaintained — ops/strred.py docstring):
    zero for identical clips, strictly increasing with distortion level,
    finite and non-negative, correct per-frame shape, and wired into
    quality_assess_video exactly like the reference's video branch."""
    import pytest

    from eld_tpu.ops.metrics import quality_assess_video
    from eld_tpu.ops.strred import strred

    t, h, w = 4, 96, 128
    base = rng.random((t, h, w), dtype=onp.float32)
    # smooth the clip a little so it has natural-image-like correlation
    base = 0.5 * (base + onp.roll(base, 1, axis=1))

    per, s0, sn0 = strred(base, base)
    assert per.shape == (t - 1, 2)
    assert s0 == pytest.approx(0.0, abs=1e-9)
    assert sn0 == pytest.approx(0.0, abs=1e-9)

    scores = []
    for amp in (0.02, 0.08, 0.3):
        noisy = onp.clip(
            base + rng.normal(0, amp, base.shape).astype(onp.float32), 0, 1)
        _, s, sn = strred(base, noisy)
        assert onp.isfinite(s) and s >= 0 and onp.isfinite(sn) and sn >= 0
        scores.append(s)
    assert scores[0] < scores[1] < scores[2], scores

    with pytest.raises(ValueError):
        strred(base[:1], base[:1])
    with pytest.raises(ValueError):
        strred(base, base[:, : h // 2])

    clip = (base[..., None].repeat(4, axis=-1) * 255).astype(onp.float32)
    noisy_clip = onp.clip(clip + 25.0, 0, 255)
    res = quality_assess_video(clip, noisy_clip)
    assert set(res) == {"PSNR", "SSIM", "STRRED", "STRREDSN"}
    assert res["STRRED"] >= 0 and onp.isfinite(res["STRRED"])
    # single-frame clips report 0, mirroring util/index.py:87-91
    res1 = quality_assess_video(clip[:1], noisy_clip[:1])
    assert res1["STRRED"] == 0.0 and res1["STRREDSN"] == 0.0


def test_strred_pluggable_subband(rng):
    """The subband extractor is swappable (the sp5-steerable hook — the
    published tables are unreachable offline, ops/strred.py docstring):
    a custom extractor must change absolute values but keep the
    metamorphic ordering, and the 2-channel guard must reject clips
    outside the reference's 3/4-channel domain."""
    import jax.numpy as jnp
    import pytest

    from eld_tpu.ops.metrics import quality_assess_video
    from eld_tpu.ops.strred import strred

    base = rng.random((4, 96, 128), dtype=onp.float32)
    base = 0.5 * (base + onp.roll(base, 1, axis=1))
    noisy = onp.clip(base + rng.normal(0, 0.1, base.shape).astype(onp.float32), 0, 1)

    def laplacian_band(frame):  # a different (valid) bandpass
        g = frame[::4, ::4]
        blur = (g + jnp.roll(g, 1, 0) + jnp.roll(g, -1, 0)
                + jnp.roll(g, 1, 1) + jnp.roll(g, -1, 1)) / 5.0
        return g - blur

    _, s_def, _ = strred(base, noisy)
    _, s_lap, _ = strred(base, noisy, subband_fn=laplacian_band)
    assert s_lap != pytest.approx(s_def)       # extractor actually used
    _, s_lap0, _ = strred(base, base, subband_fn=laplacian_band)
    assert s_lap0 == pytest.approx(0.0, abs=1e-9)
    assert s_lap > s_lap0

    bad = rng.random((3, 32, 32, 2), dtype=onp.float32)
    with pytest.raises(ValueError, match="channel"):
        quality_assess_video(bad, bad)


def test_loadmat_struct_conversion(tmp_path, rng):
    """matio.loadmat parity with the reference's util/util.py:278-326:
    top-level structs -> nested dicts; struct-interior ndarrays (numeric
    AND cell) -> nested lists; plain top-level arrays pass through."""
    import scipy.io as spio

    from eld_tpu.utils.matio import loadmat

    path = str(tmp_path / "t.mat")
    arr = rng.random((3, 2))
    spio.savemat(path, {
        "plain": arr,
        "s": {"a": 1.5, "inner": {"b": onp.arange(4)},
              "cell": onp.array([onp.arange(2), "txt", 3.0], dtype=object)},
    })
    out = loadmat(path)
    onp.testing.assert_allclose(out["plain"], arr)       # untouched
    assert isinstance(out["s"], dict)
    assert out["s"]["a"] == 1.5
    assert isinstance(out["s"]["inner"], dict)
    assert out["s"]["inner"]["b"] == [0, 1, 2, 3]        # ndarray -> list
    cell = out["s"]["cell"]
    assert cell[0] == [0, 1] and cell[1] == "txt" and cell[2] == 3.0
