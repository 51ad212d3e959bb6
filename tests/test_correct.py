"""Illuminance correction parity (reference: ELD_model.py:156-169)."""

import jax.numpy as jnp
import numpy as onp

from eld_tpu.ops.correct import illuminance_correct, illuminance_correct_batch


def ref_correct(pred, source):
    pred = onp.clip(pred, 0, 1)
    mask = source != 1
    p, s = pred[mask], source[mask]
    return (p @ s) / (p @ p) * pred


def test_matches_reference_math(rng):
    pred = rng.random((16, 16, 4), dtype=onp.float32)
    source = rng.random((16, 16, 4), dtype=onp.float32) * 1.4  # some >1 after clip
    source[0, 0, :] = 1.0  # exactly-saturated pixels excluded
    got = onp.asarray(illuminance_correct(jnp.asarray(pred), jnp.asarray(source)))
    want = ref_correct(pred, source)
    onp.testing.assert_allclose(got, want, rtol=1e-5)


def test_scale_recovery(rng):
    """If pred = target / alpha, correction recovers target exactly."""
    target = rng.random((8, 8, 4), dtype=onp.float32) * 0.5
    pred = target / 1.7
    got = onp.asarray(illuminance_correct(jnp.asarray(pred), jnp.asarray(target)))
    onp.testing.assert_allclose(got, target, rtol=1e-5)


def test_batch_shared_source(rng):
    pred = rng.random((3, 8, 8, 4), dtype=onp.float32)
    src = rng.random((1, 8, 8, 4), dtype=onp.float32)
    out = onp.asarray(illuminance_correct_batch(jnp.asarray(pred), jnp.asarray(src)))
    for i in range(3):
        onp.testing.assert_allclose(out[i], ref_correct(pred[i], src[0]), rtol=1e-5)
