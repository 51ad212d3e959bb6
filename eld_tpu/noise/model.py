"""Noise application: one jittable function, vmapped over the batch.

Physics pipeline per sample (reference semantics, ``noise.py:149-170``):

    y_dn = y * saturation_level / ratio            # clean signal in DN
    shot:  'P' z ~ Poisson(y_dn / K) * K           # exact
           'p' z = y_dn + N(0,1) * sqrt(max(K*y_dn, 1e-10))
    read:  'g' z += N(0,1) * max(g_scale, 1e-10)
           'G' z += TL(lambda) * max(G_scale, 1e-10)   # Tukey-lambda
    row:   'r' z += N_row(0,1) * R_scale           # one draw per sensor row
    quant: 'q' z += U(-0.5, 0.5)
    bias:  'c' z += color_bias[channel]
    out  = z * ratio / saturation_level

'G', 'r', 'q', 'c' constitute the full ELD TPAMI model (withheld from the
reference's released ``noise.py`` but parameterized by its shipped
calibration files).  Tukey-lambda sampling uses the inverse CDF
Q(u; lam) = (u^lam - (1-u)^lam)/lam (logistic at lam=0), matching
``scipy.stats.tukeylambda.rvs``'s transform.

Images are channels-last (..., H, W, 4); row noise is drawn per *sensor*
row: packed channels (R, G1) live on even mosaic rows and (B, G2) on odd
rows, so each packed row gets two independent row draws, mapped
(R,G1)->even, (B,G2)->odd.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eld_tpu.noise.params import NoiseParams

MODEL_ALIASES = {
    "eld": "PGrqc",  # full ELD model
    "ELD": "PGrqc",
}


def expand_model(model: str) -> str:
    """Resolve a model alias to its component characters."""
    return MODEL_ALIASES.get(model, model)


def tukey_lambda(key, shape, lam):
    """Sample the standard Tukey-lambda distribution via inverse CDF."""
    u = jax.random.uniform(key, shape, minval=1e-7, maxval=1.0 - 1e-7)
    # Q(u; lam) = (u^lam - (1-u)^lam) / lam ; limit lam->0 is logit(u).
    safe_lam = jnp.where(jnp.abs(lam) < 1e-6, 1.0, lam)
    q = (u**safe_lam - (1.0 - u) ** safe_lam) / safe_lam
    logistic = jnp.log(u) - jnp.log1p(-u)
    return jnp.where(jnp.abs(lam) < 1e-6, logistic, q)


def apply_noise(key: jax.Array, y: jnp.ndarray, p: NoiseParams, model: str = "g",
                poisson: str = "fast"):
    """Add physics-based noise to one clean packed-raw image.

    y: (H, W, C) in [0, 1]; p: scalar NoiseParams; model: component chars.
    poisson: "fast" (hybrid sampler, see noise/fast_poisson.py) or "exact"
    (jax.random.poisson's rejection sampler, ~15x slower on TPU).
    Returns the noisy image, NOT clipped (callers clip, mirroring
    ``sid_dataset.py:277``).
    """
    model = expand_model(model)
    k_shot, k_read, k_tl, k_row, k_quant = jax.random.split(key, 5)

    y = y.astype(jnp.float32) * p.saturation_level / p.ratio

    if "P" in model:
        if poisson == "fast":
            from eld_tpu.noise.fast_poisson import fast_poisson

            z = fast_poisson(k_shot, y / p.K) * p.K
        else:
            z = jax.random.poisson(k_shot, y / p.K).astype(jnp.float32) * p.K
    elif "p" in model:
        z = y + jax.random.normal(k_shot, y.shape) * jnp.sqrt(
            jnp.maximum(p.K * y, 1e-10)
        )
    else:
        z = y

    if "g" in model:
        z = z + jax.random.normal(k_read, y.shape) * jnp.maximum(p.g_scale, 1e-10)
    if "G" in model:
        z = z + tukey_lambda(k_tl, y.shape, p.G_shape) * jnp.maximum(p.G_scale, 1e-10)

    if "r" in model:
        # one draw per sensor row; packed (R,G1) sit on even rows, (B,G2) odd
        H = y.shape[0]
        rows = jax.random.normal(k_row, (H, 1, 2)) * p.R_scale
        row_noise = jnp.concatenate(
            [rows[..., 0:1], rows[..., 0:1], rows[..., 1:2], rows[..., 1:2]], axis=-1
        )
        if y.shape[-1] != 4:  # non-Bayer layouts: one draw per packed row
            row_noise = jnp.broadcast_to(rows[..., 0:1], y.shape)
        z = z + row_noise

    if "q" in model:
        z = z + jax.random.uniform(k_quant, y.shape, minval=-0.5, maxval=0.5)

    if "c" in model and y.shape[-1] == 4:
        # color bias is calibrated per Bayer channel; non-Bayer layouts
        # (9-ch X-Trans) skip it
        z = z + p.color_bias.reshape((1, 1, -1))

    return z * p.ratio / p.saturation_level


def synthesize(key, clean, params: NoiseParams, model: str = "g", clip: bool = True,
               poisson: str = "fast"):
    """Batched noise synthesis: clean (N, H, W, C) + batched params -> noisy.

    This is the on-device replacement for the reference's CPU-worker
    ``SynDataset`` loop (``dataset/sid_dataset.py:259-280``); it jits and
    fuses into the train step.
    """
    n = clean.shape[0]
    keys = jax.random.split(key, n)
    noisy = jax.vmap(lambda k, y, p: apply_noise(k, y, p, model, poisson=poisson))(
        keys, clean, params)
    if clip:
        noisy = jnp.clip(noisy, 0.0, 1.0)
    return noisy
