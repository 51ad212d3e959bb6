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

    The loop is UNROLLED in Python with the 1/(k+1) reciprocals baked in
    as compile-time constants: the fori_loop body paid a vector divide
    plus an int->f32 cast per iteration per element — at _N_TERMS=40
    over a 512^2x16x4 batch that was most of the fused noise kernel's
    VPU time (measured on v5e: kernel 7.14 -> 4.82 ms per batch-16 draw,
    -32%; the kernel is VPU-compute-bound at ~50x its bandwidth floor).
    pk*lam*(1/(k+1)) differs from pk*lam/(k+1) by <= 1 ulp per term; the
    distribution tests (PMF/KS, tests/test_noise.py) pin the statistics.
    """
    pk = cdf = jnp.exp(-lam_s)
    count = jnp.zeros_like(lam_s)
    for k in range(_N_TERMS):
        # gate on pk: once terms underflow the remaining mass is < 1e-10;
        # without it a u above the f32-saturated cdf would run to _N_TERMS
        live = jnp.logical_and(cdf < u, pk > 1e-12)
        count = count + live.astype(jnp.float32)
        pk = pk * (lam_s * (1.0 / (k + 1)))
        cdf = cdf + pk
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
