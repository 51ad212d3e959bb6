"""Fused Pallas TPU kernel for physics noise synthesis.

One VMEM pass per (rows x W*C) tile generates every noise component with
the on-core hardware PRNG (``pltpu.prng_random_bits``) instead of
XLA's counter-based threefry — the threefry bit generation is most of
the cost of the pure-jnp path.  Components fused per tile:

    shot noise (hybrid Poisson: fixed-step inverse-CDF below lam=12,
    normal approx above — same algorithm as noise/fast_poisson.py),
    Gaussian read, Tukey-lambda read, per-sensor-row noise,
    quantization noise, per-channel color bias

Layout: the (N, H, W, 4) batch is viewed as (N, H, W*4) so the lane
dimension is 128-aligned; channel identity is recovered as lane%4.
Grid = (N, H/BH); per-image parameters ride in SMEM.

The kernel is validated distributionally against the jnp reference path
(tests/test_pallas_noise.py) and is the default on TPU; the jnp path
remains the fallback (interpret mode / CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eld_tpu.noise.fast_poisson import SMALL_MAX, poisson_small_from_uniform
from eld_tpu.noise.params import NoiseParams

BH = 128          # rows per tile

_TWO_PI = 6.283185307179586


def _uniform(shape):
    """U(0,1) in f32 from hardware random bits (24-bit mantissa path).

    prng_random_bits yields *signed* int32 and Mosaic can't cast
    uint32->f32, so mask down to the low 23 bits (non-negative int32)."""
    bits = pltpu.prng_random_bits(shape)
    return (bits & 0x007FFFFF).astype(jnp.float32) * (1.0 / 8388608.0)


def _normal_pair(shape):
    """Two independent N(0,1) draws via Box-Muller."""
    u1 = jnp.maximum(_uniform(shape), 1e-7)
    u2 = _uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2), r * jnp.sin(_TWO_PI * u2)


def _normal_one(shape):
    """One N(0,1) draw — Box-Muller cosine leg only (skips the sin)."""
    u1 = jnp.maximum(_uniform(shape), 1e-7)
    u2 = _uniform(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _poisson_hybrid(lam, n_norm):
    """Poisson(lam) given a standard normal draw for the large branch.
    The small branch is fast_poisson's shared inverse-CDF loop (one
    implementation; the gate constants cannot drift between paths)."""
    u = jnp.maximum(_uniform(lam.shape), 1e-12)
    small = poisson_small_from_uniform(jnp.minimum(lam, SMALL_MAX), u)
    large = jnp.maximum(jnp.round(lam + jnp.sqrt(lam) * n_norm), 0.0)
    return jnp.where(lam > SMALL_MAX, large, small)


def _noise_kernel(seed_ref, K_ref, g_ref, G_ref, lamb_ref, R_ref, cb_ref,
                  sat_ref, ratio_ref, y_ref, out_ref, *, model: str,
                  channels: int):
    img = pl.program_id(0)
    tile = pl.program_id(1)
    # FOLD the step seed and the (img, tile) index as TWO seed words
    # (Mosaic's cap) instead of adding them into one: additive seeding
    # (seed + img*tiles + tile) reused identical bit-streams whenever
    # two step seeds differed by < n*tiles — consecutive step numbers
    # would replay (step s, tile t+1) as (step s+1, tile t).  With two
    # folded words, distinct step seeds give distinct streams for ALL
    # tiles, and within a step img*tiles+tile is injective.
    pltpu.prng_seed(seed_ref[0, 0], img * pl.num_programs(1) + tile)

    K = K_ref[img, 0]
    sat = sat_ref[img, 0]
    ratio = ratio_ref[img, 0]

    y = y_ref[0] * (sat / ratio)  # (bh, w*c): rows x lanes
    shape = y.shape

    # model is static: only pay the Box-Muller transcendentals when a
    # component actually consumes a normal draw — and only the legs that
    # are consumed (e.g. 'PGrqc' needs n1 but not n2; the unused sin leg
    # over the full tile is not free)
    need_shot = "P" in model or "p" in model
    need_read = "g" in model
    if need_shot and need_read:
        n1, n2 = _normal_pair(shape)
    elif need_shot:
        n1 = _normal_one(shape)
    elif need_read:
        n2 = _normal_one(shape)

    if "P" in model:
        z = _poisson_hybrid(y / K, n1) * K
    elif "p" in model:
        z = y + n1 * jnp.sqrt(jnp.maximum(K * y, 1e-10))
    else:
        z = y

    if "g" in model:
        z = z + n2 * jnp.maximum(g_ref[img, 0], 1e-10)

    if "G" in model:
        lam = lamb_ref[img, 0]
        u = jnp.clip(_uniform(shape), 1e-7, 1.0 - 1e-7)
        safe = jnp.where(jnp.abs(lam) < 1e-6, 1.0, lam)
        q = (jnp.exp(safe * jnp.log(u)) - jnp.exp(safe * jnp.log1p(-u))) / safe
        logistic = jnp.log(u) - jnp.log1p(-u)
        tl = jnp.where(jnp.abs(lam) < 1e-6, logistic, q)
        z = z + tl * jnp.maximum(G_ref[img, 0], 1e-10)

    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    chan = lane % channels

    if "r" in model:
        # one draw per sensor row, two lanes needed ((R,G1)->even,
        # (B,G2)->odd): take one lane from EACH Box-Muller leg of a single
        # (BH, 128) pair — both legs are consumed, honoring the
        # only-pay-for-consumed-legs rule (cos/sin legs of one (u1,u2)
        # pair are independent N(0,1))
        rn_c, rn_s = _normal_pair((shape[0], 128))
        even = jax.lax.broadcast_in_dim(rn_c[:, 0], shape, (0,))
        odd = jax.lax.broadcast_in_dim(rn_s[:, 0], shape, (0,))
        row = jnp.where(chan < 2, even, odd) if channels == 4 else even
        z = z + row * R_ref[img, 0]

    if "q" in model:
        z = z + (_uniform(shape) - 0.5)

    if "c" in model and channels == 4:
        # per-Bayer-channel bias; non-Bayer layouts skip it (same guard as
        # the jnp and host paths)
        c0, c1, c2, c3 = (cb_ref[img, 0], cb_ref[img, 1], cb_ref[img, 2], cb_ref[img, 3])
        bias = jnp.where(chan == 0, c0,
                         jnp.where(chan == 1, c1,
                                   jnp.where(chan == 2, c2, c3)))
        z = z + bias

    out_ref[0] = z * (ratio / sat)


@functools.partial(jax.jit, static_argnames=("model", "interpret", "clip"))
def synthesize_pallas(seed, clean, params: NoiseParams, model: str = "PGrqc",
                      interpret: bool = False, clip: bool = True):
    """Fused noise synthesis. clean: (N, H, W, C); params batched (N,).

    seed: int32 scalar (distinct per step; (seed, image, tile) are folded
    into the hardware PRNG, so consecutive step seeds are safe).
    clip=False returns the raw noisy signal (sub-zero noise floor kept),
    matching ``synthesize(..., clip=False)``'s contract.
    """
    from eld_tpu.noise.model import expand_model

    model = expand_model(model)
    n, h, w, c = clean.shape
    assert (w * c) % 128 == 0, f"W*C={w*c} must be lane-aligned (128)"
    assert h % 8 == 0, f"H={h} must be a multiple of 8"
    # largest 8-multiple tile height that divides H (h=136 -> bh=8, not 128)
    bh = next(d for d in range(min(BH, h), 0, -8) if h % d == 0)

    flat = clean.reshape(n, h, w * c)

    smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)

    scalar = lambda x: jnp.asarray(x, jnp.float32).reshape(n, 1)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_noise_kernel, model=model, channels=c),
        grid=(n, h // bh),
        in_specs=[
            smem_full,  # seed (1,1)
            smem_full, smem_full, smem_full, smem_full, smem_full,  # K g G lam R
            smem_full,  # color bias (n, 4)
            smem_full, smem_full,  # sat ratio
            pl.BlockSpec((1, bh, w * c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w * c), jnp.float32),
        interpret=interpret,
    )(
        seed_arr,
        scalar(params.K), scalar(params.g_scale), scalar(params.G_scale),
        scalar(params.G_shape), scalar(params.R_scale),
        jnp.asarray(params.color_bias, jnp.float32).reshape(n, -1)[:, :4],
        scalar(params.saturation_level), scalar(params.ratio),
        flat,
    )
    out = out.reshape(n, h, w, c)
    return jnp.clip(out, 0.0, 1.0) if clip else out
