"""Statistical parity tests for the noise model.

jax.random is not bit-compatible with the reference's NumPy MT19937, so
parity is distributional: moments and KS tests against the published
physics (reference equations at noise.py:149-170, 201-225).
"""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest
import scipy.stats as sps

from eld_tpu.noise import (
    CameraParamsBank,
    load_camera_params,
    sample_params,
    sample_params_batch,
    synthesize,
    SATURATION_DEFAULT,
)
from eld_tpu.noise.model import apply_noise, tukey_lambda, expand_model
from eld_tpu.noise.params import NoiseParams


def fixed_params(K=2.0, g=4.0, G=3.0, lam=0.1, R=1.0, ratio=200.0, cb=None):
    return NoiseParams(
        K=jnp.float32(K),
        g_scale=jnp.float32(g),
        G_scale=jnp.float32(G),
        G_shape=jnp.float32(lam),
        R_scale=jnp.float32(R),
        color_bias=jnp.asarray(cb if cb is not None else onp.zeros(4), jnp.float32),
        saturation_level=jnp.float32(SATURATION_DEFAULT),
        ratio=jnp.float32(ratio),
    )


def test_bank_loads_all_cameras():
    bank = load_camera_params()
    assert bank.num_cameras == 5
    assert bank.g_shape.shape == (5, 18)
    assert bank.color_bias.shape == (5, 18, 4)
    assert (bank.kmin > 0).all() and (bank.kmax > bank.kmin).all()


def test_include_exclude():
    assert load_camera_params(include=4).num_cameras == 1
    assert load_camera_params(exclude=0).num_cameras == 4


def test_sampled_param_distributions():
    bank = load_camera_params(include=4)  # SonyA7S2
    p = sample_params_batch(jax.random.PRNGKey(0), bank, 4096)
    K = onp.asarray(p.K)
    ratio = onp.asarray(p.ratio)
    # log K ~ U(log .1, log 30)  (noise.py:215)
    assert K.min() >= 0.1 - 1e-5 and K.max() <= 30 + 1e-3
    logk = onp.log(K)
    lo, hi = onp.log(0.1), onp.log(30)
    assert abs(logk.mean() - (lo + hi) / 2) < 0.05
    ks = sps.kstest((logk - lo) / (hi - lo), "uniform")
    assert ks.pvalue > 1e-3
    # ratio ~ U(100, 300)  (noise.py:223)
    assert ratio.min() >= 100 and ratio.max() <= 300
    assert abs(ratio.mean() - 200) < 3
    # log g_scale = N*sigma + slope*logK + bias  (noise.py:217-218):
    # regress log g on log K and recover the calibrated slope/bias/sigma
    logg = onp.log(onp.asarray(p.g_scale))
    slope, bias = onp.polyfit(logk, logg, 1)
    resid = logg - (slope * logk + bias)
    assert abs(slope - float(bank.g_slope[0])) < 0.05
    assert abs(bias - float(bank.g_bias[0])) < 0.05
    assert abs(resid.std() - float(bank.g_sigma[0])) < 0.02
    assert float(p.saturation_level[0]) == 16383 - 800


def test_calibrated_k_mode():
    bank = load_camera_params(include=4)
    p = sample_params_batch(jax.random.PRNGKey(1), bank, 1024, k_mode="calibrated")
    K = onp.asarray(p.K)
    assert K.min() >= float(bank.kmin[0]) - 1e-5
    assert K.max() <= float(bank.kmax[0]) + 1e-4


def test_gaussian_read_noise_moments():
    """model='g': z = y + N*g_scale (in DN), rescaled (noise.py:165-169)."""
    p = fixed_params(g=4.0)
    y = jnp.full((256, 256, 4), 0.25, jnp.float32)
    z = apply_noise(jax.random.PRNGKey(2), y, p, model="g")
    err_dn = (onp.asarray(z) - 0.25) * SATURATION_DEFAULT / float(p.ratio)
    assert abs(err_dn.mean()) < 0.05
    assert abs(err_dn.std() - 4.0) < 0.05


def test_poisson_gaussian_approx_moments():
    """model='pg': var = K*y_dn + g^2 in DN."""
    p = fixed_params(K=2.0, g=4.0)
    level = 0.5
    y = jnp.full((256, 256, 4), level, jnp.float32)
    z = apply_noise(jax.random.PRNGKey(3), y, p, model="pg")
    y_dn = level * SATURATION_DEFAULT / float(p.ratio)
    err_dn = (onp.asarray(z) - level) * SATURATION_DEFAULT / float(p.ratio)
    expected_var = 2.0 * y_dn + 16.0
    assert abs(err_dn.mean()) < 0.1
    assert abs(err_dn.var() / expected_var - 1.0) < 0.02


def test_exact_poisson_moments():
    """model='P': z = Poisson(y_dn/K)*K — mean y_dn, var K*y_dn."""
    p = fixed_params(K=2.0)
    level = 0.5
    y = jnp.full((256, 256, 4), level, jnp.float32)
    z = apply_noise(jax.random.PRNGKey(4), y, p, model="P")
    y_dn = level * SATURATION_DEFAULT / float(p.ratio)
    z_dn = onp.asarray(z) * SATURATION_DEFAULT / float(p.ratio)
    assert abs(z_dn.mean() / y_dn - 1.0) < 5e-3
    assert abs(z_dn.var() / (2.0 * y_dn) - 1.0) < 2e-2
    # Poisson support: z/K must be integers
    lam_counts = z_dn / 2.0
    onp.testing.assert_allclose(lam_counts, onp.round(lam_counts), atol=1e-3)


def test_tukey_lambda_matches_scipy():
    for lam in (-0.14, 0.0, 0.09, 0.13):
        s = tukey_lambda(jax.random.PRNGKey(5), (200_000,), jnp.float32(lam))
        ks = sps.kstest(onp.asarray(s), sps.tukeylambda(lam).cdf)
        assert ks.pvalue > 1e-3, (lam, ks)


def test_row_noise_constant_within_sensor_row():
    p = fixed_params(R=5.0)
    y = jnp.zeros((64, 64, 4), jnp.float32)
    z = onp.asarray(apply_noise(jax.random.PRNGKey(6), y, p, model="r"))
    # channels R,G1 (even sensor rows) share a draw; B,G2 (odd rows) share
    for row in range(8):
        assert onp.ptp(z[row, :, 0]) < 1e-6
        onp.testing.assert_allclose(z[row, :, 0], z[row, :, 1], atol=1e-6)
        onp.testing.assert_allclose(z[row, :, 2], z[row, :, 3], atol=1e-6)
    # even/odd draws are independent
    assert onp.std(z[:, 0, 0] - z[:, 0, 2]) > 0
    # scale: std of per-row values in DN should be ~R_scale
    rows_dn = z[:, 0, 0] * SATURATION_DEFAULT / float(p.ratio)
    assert abs(rows_dn.std() / 5.0 - 1.0) < 0.3


def test_quant_noise_uniform():
    p = fixed_params()
    y = jnp.zeros((128, 128, 4), jnp.float32)
    z = onp.asarray(apply_noise(jax.random.PRNGKey(7), y, p, model="q"))
    dn = z * SATURATION_DEFAULT / float(p.ratio)
    assert dn.min() >= -0.5 and dn.max() <= 0.5
    assert abs(dn.var() - 1.0 / 12.0) < 5e-3


def test_color_bias():
    cb = onp.array([1.0, -2.0, 3.0, 0.5], onp.float32)
    p = fixed_params(cb=cb)
    y = jnp.zeros((8, 8, 4), jnp.float32)
    z = onp.asarray(apply_noise(jax.random.PRNGKey(8), y, p, model="c"))
    dn = z * SATURATION_DEFAULT / float(p.ratio)
    onp.testing.assert_allclose(dn[0, 0], cb, rtol=1e-5)


@pytest.mark.slow
def test_full_eld_model_runs_and_clips():
    bank = load_camera_params()
    assert expand_model("eld") == "PGrqc"
    clean = jnp.clip(jax.random.uniform(jax.random.PRNGKey(9), (4, 32, 32, 4)), 0, 1)
    params = sample_params_batch(jax.random.PRNGKey(10), bank, 4)
    noisy = synthesize(jax.random.PRNGKey(11), clean, params, model="eld")
    assert noisy.shape == clean.shape
    assert float(noisy.min()) >= 0.0 and float(noisy.max()) <= 1.0
    # noise actually does something
    assert float(jnp.abs(noisy - clean).mean()) > 1e-4


def test_synthesize_distinct_per_sample():
    """Per-sample key threading: no duplicated noise across the batch
    (the reference needs worker_init_fn reseeding to avoid this)."""
    bank = load_camera_params()
    clean = jnp.full((4, 16, 16, 4), 0.5, jnp.float32)
    params = sample_params_batch(jax.random.PRNGKey(12), bank, 4)
    noisy = onp.asarray(synthesize(jax.random.PRNGKey(13), clean, params, model="pg"))
    for i in range(4):
        for j in range(i + 1, 4):
            assert onp.abs(noisy[i] - noisy[j]).max() > 1e-6


def test_jit_compatible():
    bank = load_camera_params(include=4)
    fn = jax.jit(lambda k, y: synthesize(
        k, y, sample_params_batch(k, bank, y.shape[0]), model="eld"))
    out = fn(jax.random.PRNGKey(14), jnp.full((2, 32, 32, 4), 0.3))
    assert out.shape == (2, 32, 32, 4)


def test_fast_poisson_distribution():
    """Hybrid sampler matches the exact PMF below the switch point and the
    first two moments above it (noise/fast_poisson.py)."""
    from eld_tpu.noise.fast_poisson import fast_poisson

    for lam in (0.05, 0.5, 2.0, 8.0):
        s = onp.asarray(fast_poisson(jax.random.PRNGKey(int(lam * 100)),
                                     jnp.full((300_000,), lam)))
        vals, counts = onp.unique(s, return_counts=True)
        pmf_err = onp.abs(counts / len(s) - sps.poisson(lam).pmf(vals)).max()
        assert pmf_err < 2.5e-3, (lam, pmf_err)
        assert abs(s.var() / lam - 1.0) < 0.02, lam
    for lam in (30.0, 500.0):
        s = onp.asarray(fast_poisson(jax.random.PRNGKey(7), jnp.full((200_000,), lam)))
        assert abs(s.mean() / lam - 1.0) < 5e-3
        assert abs(s.var() / lam - 1.0) < 2e-2


def test_fast_poisson_mixed_rates():
    """Per-pixel rates crossing the hybrid switch point stay unbiased."""
    from eld_tpu.noise.fast_poisson import fast_poisson

    lam = jnp.asarray(onp.geomspace(0.01, 1000, 64, dtype=onp.float32))
    lam = jnp.tile(lam, (10_000, 1))
    s = onp.asarray(fast_poisson(jax.random.PRNGKey(3), lam))
    rel = onp.abs(s.mean(0) / onp.asarray(lam[0]) - 1.0)
    # per-rate sampling error ~ 1/sqrt(n*lam); allow 5 sigma
    tol = 5.0 / onp.sqrt(10_000 * onp.asarray(lam[0]))
    assert (rel < onp.maximum(tol, 5e-3)).all()


def test_iso_sampling_respects_per_camera_counts():
    """Cameras with 16 calibrated ISOs never sample the padded rows
    (regression: padding previously 3x-oversampled the last real ISO)."""
    bank = load_camera_params()
    n_iso = onp.asarray(bank.n_iso)
    assert set(n_iso.tolist()) <= {16, 18}
    # sample many params from a 16-ISO camera; its padded G_shape rows
    # equal row 15, so check the drawn lambdas match only rows < 16
    cam16 = int(onp.argmin(n_iso))
    bank1 = load_camera_params(include=cam16)
    assert int(bank1.n_iso[0]) == 16
    p = sample_params_batch(jax.random.PRNGKey(0), bank1, 4000)
    shapes = onp.asarray(p.G_shape)
    real = onp.asarray(bank1.g_shape[0][:16])
    counts = onp.array([(shapes == v).sum() for v in onp.unique(real)])
    # uniform over 16 settings: the most-drawn value must not be ~3x the
    # median (it would be if padding rows were samplable)
    assert counts.max() < onp.median(counts) * 1.8
