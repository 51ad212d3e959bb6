"""Host (NumPy) noise model vs on-device (jax.random) — distributional
cross-validation between the two implementations of the same physics."""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest
import scipy.stats as sps

from eld_tpu.noise import load_camera_params, sample_params_batch
from eld_tpu.noise.host import HostNoiseModel
from eld_tpu.noise.model import apply_noise
from eld_tpu.noise.params import NoiseParams


def test_param_distributions_match():
    host = HostNoiseModel("eld", include=4, rng=onp.random.default_rng(0))
    hk = onp.array([host._sample_params()["K"] for _ in range(3000)])
    hr = onp.array([host._sample_params()["ratio"] for _ in range(3000)])

    bank = load_camera_params(include=4)
    dev = sample_params_batch(jax.random.PRNGKey(0), bank, 3000)
    dk = onp.asarray(dev.K)
    dr = onp.asarray(dev.ratio)

    assert sps.kstest(onp.log(hk), onp.log(dk)).pvalue > 1e-3
    assert sps.kstest(hr, dr).pvalue > 1e-3


def test_g_scale_conditional_matches():
    host = HostNoiseModel("eld", include=4, rng=onp.random.default_rng(1))
    hs = [host._sample_params() for _ in range(4000)]
    h_logk = onp.log([p["K"] for p in hs])
    h_logg = onp.log([p["g_scale"] for p in hs])
    h_slope, h_bias = onp.polyfit(h_logk, h_logg, 1)

    bank = load_camera_params(include=4)
    dev = sample_params_batch(jax.random.PRNGKey(1), bank, 4000)
    d_slope, d_bias = onp.polyfit(onp.log(onp.asarray(dev.K)),
                                  onp.log(onp.asarray(dev.g_scale)), 1)
    assert abs(h_slope - d_slope) < 0.05
    assert abs(h_bias - d_bias) < 0.05


@pytest.mark.parametrize("model", ["g", "pg", "Pg", "PGrqc"])
def test_noise_application_moments_match(model):
    """Same fixed params through host and device paths -> same moments."""
    pd = dict(K=2.0, g_scale=4.0, G_scale=3.0, G_shape=0.1, R_scale=1.5,
              color_bias=onp.zeros(4, onp.float32),
              saturation_level=16383.0 - 800.0, ratio=200.0)
    y = onp.full((192, 192, 4), 0.4, onp.float32)

    host = HostNoiseModel(model, include=4, rng=onp.random.default_rng(2))
    z_h = host(y, params=pd)

    p_dev = NoiseParams(**{k: jnp.asarray(v, jnp.float32) for k, v in pd.items()})
    z_d = onp.asarray(apply_noise(jax.random.PRNGKey(2), jnp.asarray(y), p_dev, model))

    e_h = (z_h - y).ravel()
    e_d = (z_d - y).ravel()
    # mean difference bounded by 4x the standard error of the difference;
    # row noise ('r') is correlated across each row, so only 2H of its
    # draws are independent — account for that separately.
    se_iid = e_d.std() * onp.sqrt(2.0 / e_d.size)
    scale = pd["ratio"] / pd["saturation_level"]
    se_row = 0.0
    if "r" in model:
        se_row = pd["R_scale"] * scale / onp.sqrt(2 * y.shape[0])
    se = onp.sqrt(se_iid**2 + 2 * se_row**2)
    assert abs(e_h.mean() - e_d.mean()) < 4 * se
    assert abs(e_h.std() / e_d.std() - 1.0) < 0.05
