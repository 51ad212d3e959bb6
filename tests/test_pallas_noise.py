"""Fused Pallas noise kernel tests.

The TPU interpret mode on CPU stubs out the hardware PRNG (random bits
come back constant), so statistical validation only means anything on a
real TPU: it runs when the suite executes on TPU hardware and via
``python -m eld_tpu.tools.validate_pallas`` (the driver's bench
environment), and is skipped on the CPU-simulated CI mesh.
"""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest
from jax.experimental.pallas import tpu as pltpu

from eld_tpu.noise import load_camera_params, sample_params_batch, synthesize
from eld_tpu.noise.kernels import synthesize_pallas

ON_TPU = jax.devices()[0].platform == "tpu"


@pytest.fixture(scope="module")
def setup():
    bank = load_camera_params()
    clean = jnp.asarray(
        onp.random.default_rng(0).random((2, 64, 32, 4), dtype=onp.float32))
    params = sample_params_batch(jax.random.PRNGKey(5), bank, 2)
    return clean, params


@pytest.mark.parametrize("model", ["g", "pg", "Pg", "eld"])
def test_pallas_compiles_in_interpret_mode(setup, model):
    """Structure/lowering check (RNG is stubbed on CPU — values not used).

    The four models cover every Box-Muller draw shape under the
    single-leg rule: 'g' and 'eld' (PGrqc) each consume ONE normal and
    draw it via _normal_one (the cos leg; the sin leg is never computed),
    'pg'/'Pg' consume two and draw the full pair.
    """
    clean, params = setup
    out = synthesize_pallas(42, clean, params, model=model,
                            interpret=pltpu.InterpretParams())
    assert out.shape == clean.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_pallas_rejects_misaligned(setup):
    _, params = setup
    with pytest.raises(AssertionError):
        synthesize_pallas(0, jnp.zeros((2, 16, 25, 4)), params,
                          interpret=pltpu.InterpretParams())


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG needs a real TPU")
@pytest.mark.parametrize("model", ["g", "pg", "Pg", "eld"])
def test_pallas_matches_jnp_statistically(setup, model):
    clean, params = setup
    out = synthesize_pallas(42, clean, params, model=model)
    ref = synthesize(jax.random.PRNGKey(7), clean, params, model=model)
    e_p = onp.asarray(out - clean)
    e_r = onp.asarray(ref - clean)
    for i in range(clean.shape[0]):
        se = max(e_r[i].std() / onp.sqrt(e_r[i].size) * 6, 1e-4)
        if "r" in model or model == "eld":
            se += 6 * float(params.R_scale[i] * params.ratio[i]
                            / params.saturation_level[i]) / onp.sqrt(2 * clean.shape[1])
        assert abs(e_p[i].mean() - e_r[i].mean()) < se, (model, i)
        assert abs(e_p[i].std() / max(e_r[i].std(), 1e-6) - 1.0) < 0.15, (model, i)


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG needs a real TPU")
def test_pallas_distinct_noise_per_seed(setup):
    clean, params = setup
    a = synthesize_pallas(1, clean, params, model="g")
    b = synthesize_pallas(2, clean, params, model="g")
    assert float(jnp.abs(a - b).max()) > 1e-6


def test_pallas_tile_height_divisor():
    """H values that are 8-multiples but not 128-multiples pick a valid
    tile height (regression: h=136 previously hit an assert)."""
    bank = load_camera_params()
    params = sample_params_batch(jax.random.PRNGKey(0), bank, 1)
    out = synthesize_pallas(0, jnp.zeros((1, 136, 32, 4)), params, model="g",
                            interpret=pltpu.InterpretParams())
    assert out.shape == (1, 136, 32, 4)
