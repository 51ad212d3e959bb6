"""Illuminance correction: scalar brightness alignment before metrics.

Parity with the reference's ``IlluminanceCorrect`` (``models/ELD_model.py:
156-169``): clamp the prediction to [0,1], then scale it by
alpha = <pred, source> / <pred, pred> computed over pixels where
``source != 1`` (saturated source pixels are excluded).  The masked dot
products become masked sums here (identical math, jit/batch friendly).
"""

from __future__ import annotations

import jax.numpy as jnp


def illuminance_correct(pred, source):
    """Correct one image: pred, source (H, W, C) -> scaled pred.

    Degenerate cases (all-zero prediction after the clip, or a fully
    saturated source leaving an empty mask) keep alpha = 1 instead of
    0/0 = NaN — the reference NaNs there, which would silently poison
    eval metrics and best-checkpoint tracking."""
    pred = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
    source = source.astype(jnp.float32)
    mask = (source != 1.0).astype(jnp.float32)
    num = jnp.sum(pred * source * mask)
    den = jnp.sum(pred * pred * mask)
    alpha = jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 1.0)
    return alpha * pred


def illuminance_correct_batch(pred, source):
    """Batched (N, H, W, C) wrapper; if source has batch 1 it is shared,
    mirroring the reference's forward dispatch (``ELD_model.py:143-154``)."""
    import jax

    if source.shape[0] == 1 and pred.shape[0] != 1:
        return jax.vmap(lambda p: illuminance_correct(p, source[0]))(pred)
    return jax.vmap(illuminance_correct)(pred, source)
