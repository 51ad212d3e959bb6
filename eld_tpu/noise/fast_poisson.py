"""Fast per-pixel-rate Poisson sampling for TPU.

``jax.random.poisson`` uses Hörmann-style transformed rejection with a
``while_loop`` that iterates whole-array rounds until every lane accepts —
a poor fit for the VPU (measured ~35 ms for an 8x512x512x4 batch, ~30% of
the whole fused train step).  Shot-noise rates here span ~0..3000
electrons with most pixels dark, so a branch-free hybrid is much faster
and statistically indistinguishable for this workload:

  * lam <= SMALL_MAX: exact inverse-CDF search with a FIXED number of
    accumulation steps (vectorized Knuth; truncation error < 1e-9 at the
    switch point);
  * lam  > SMALL_MAX: normal approximation round(lam + sqrt(lam)*N)
    clamped at >= 0 — error O(1/sqrt(lam)); the 12-electron switch point
    is KS-validated against scipy at and above the threshold
    (tests/test_noise.py), trading the literature's conservative ~15
    for 8 fewer CDF terms in the hot loop.

Exactness-critical callers (distribution parity tests, replay) can use
``jax.random.poisson`` via ``synthesize(..., poisson="exact")``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SMALL_MAX = 12.0
# enough CDF terms to cover lam <= SMALL_MAX to ~1e-9 tail mass
_N_TERMS = 40
# terms per unrolled block of the inverse-CDF loop (must divide _N_TERMS)
_UNROLL = 20
# a non-multiple would silently truncate _N_TERMS % _UNROLL tail CDF terms
assert _N_TERMS % _UNROLL == 0, "_UNROLL must divide _N_TERMS"


def poisson_small_from_uniform(lam_s, u):
    """Fixed-step inverse-CDF Poisson for lam_s <= SMALL_MAX given
    uniform draws ``u`` in (0, 1].  PRNG-agnostic and Pallas-compatible
    — the single implementation shared by ``fast_poisson`` and the
    fused kernel (``noise/kernels.py``), so the gate constants cannot
    drift between the two paths.

    Accumulates F = sum_{k<=n} e^-lam lam^k / k!; count = #{F < u}.
    The term recursion runs in LINEAR space (p_{k+1} = p_k*lam/(k+1)):
    one exp total — TPU's approximate transcendentals in a per-term
    log/exp recursion visibly skew the small-lam distribution.

    The loop is BLOCK-unrolled (_UNROLL terms per fori_loop iteration)
    with the 1/(k+1) reciprocal computed as a SCALAR divide per term
    (the scalar core runs it alongside the vector work): the original
    rolled body paid a VECTOR divide plus an int->f32 vector cast per
    iteration per element — at _N_TERMS=40 over a 512^2x16x4 batch that
    was most of the fused noise kernel's VPU time.  Measured on v5e per
    batch-16 draw: rolled 7.14/7.26 ms, block-8 4.80, block-20 4.40
    (-38%), full 40-term unroll 4.72 AND a Mosaic scoped-vmem OOM on the
    'Pg' model (40 x (128, 2048)-f32 live ranges overflow the 16 MB
    vector stack), so block-20 is both the fastest and the only variant
    that compiles for every model.  pk*lam*(1/(k+1)) differs from
    pk*lam/(k+1) by <= 1 ulp per term; the distribution tests (PMF/KS,
    tests/test_noise.py) pin the statistics.
    """
    def block(b, carry):
        pk, cdf, count = carry
        kf = b.astype(jnp.float32) * _UNROLL
        for j in range(_UNROLL):
            # gate on pk: once terms underflow the remaining mass is
            # < 1e-10; without it a u above the f32-saturated cdf would
            # run to _N_TERMS
            live = jnp.logical_and(cdf < u, pk > 1e-12)
            count = count + live.astype(jnp.float32)
            r = 1.0 / (kf + (j + 1.0))  # scalar divide
            pk = pk * (lam_s * r)
            cdf = cdf + pk
        return pk, cdf, count

    p0 = jnp.exp(-lam_s)
    _, _, count = jax.lax.fori_loop(
        0, _N_TERMS // _UNROLL, block, (p0, p0, jnp.zeros_like(lam_s)))
    return count


def fast_poisson(key, lam: jnp.ndarray) -> jnp.ndarray:
    """Sample Poisson(lam) elementwise; returns float32 counts."""
    k_u, k_n = jax.random.split(key)
    lam = jnp.maximum(lam.astype(jnp.float32), 0.0)

    u = jax.random.uniform(k_u, lam.shape, dtype=jnp.float32,
                           minval=1e-12, maxval=1.0)
    small = poisson_small_from_uniform(jnp.minimum(lam, SMALL_MAX), u)

    # --- large branch: normal approximation ---
    n = jax.random.normal(k_n, lam.shape, dtype=jnp.float32)
    large = jnp.maximum(jnp.round(lam + jnp.sqrt(lam) * n), 0.0)

    return jnp.where(lam > SMALL_MAX, large, small)
