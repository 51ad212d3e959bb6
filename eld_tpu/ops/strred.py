"""Spatio-Temporal Reduced-Reference Entropic Differencing (ST-RRED).

The reference's video-quality branch calls ``skvideo.measure.strred``
(``util/index.py:5,88``).  skvideo is unmaintained (NumPy-2 incompatible,
absent from this image — the reference's own STRRED path cannot run here
either), so this is a from-the-paper JAX implementation of

    R. Soundararajan and A. C. Bovik, "Video Quality Assessment by
    Reduced Reference Spatio-Temporal Entropic Differencing," IEEE
    TCSVT 2013.

Algorithm (per consecutive-frame pair):
  * take a bandpass subband of the frame (spatial stream) and of the
    frame difference (temporal stream) at a coarse scale;
  * model subband coefficients as a Gaussian Scale Mixture over 3x3
    blocks: covariance C over block vectors, per-block premultiplier
    s_i = w_i^T C^{-1} w_i / 9, local entropies
    h_i = 1/2 sum_j log2(2*pi*e*(s_i lambda_j + sigma_n^2));
  * scale entropies by log2(1+s) (and the temporal stream additionally
    by the spatial log2(1+s), suppressing entropy differences where the
    reference itself has little structure);
  * the per-frame spatial/temporal RRED indexes are the mean absolute
    scaled-entropy differences between reference and distorted; ST-RRED
    is the product of their temporal means.

Subband extractor: skvideo feeds frames through a band of Simoncelli's
sp5Filters steerable pyramid (level 4, first orientation).  The default
here is the same subband computed from the *analytic* steerable-pyramid
construction the sp5 tap tables approximate (``ops/steerable.py`` — the
tap tables themselves are verified unreachable offline, but the defining
frequency-domain math is exact and published).  Remaining differences vs
skvideo are numerical-tolerance, not structural: exact vs tap-approximated
frequency response, and periodic (FFT) vs reflected boundaries.  The
extractor stays PLUGGABLE (``strred(..., subband_fn=...)``); an isotropic
bandpass at the same scale (``isotropic_subband``) is kept for frames too
small for steerable level 4.  The entropic-differencing core — the metric
itself — follows the paper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eld_tpu.ops.steerable import steerable_band

_BLK = 3
_SIGMA_NSQ = 0.1
_LEVELS = 3  # blur+decimate steps before the bandpass (scale 1/8)


def _blur(x):
    """Separable 5-tap binomial blur, zero-padded edges; x: (H, W)."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0
    x = jax.lax.conv_general_dilated(
        x[None, :, :, None], k[:, None, None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, k[None, :, None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x[0, :, :, 0]


def isotropic_subband(frame):
    """Coarse-scale isotropic bandpass of one (H, W) frame (scale 1/8).

    The orientation-free fallback extractor (module docstring); the
    default is the analytic steerable band at the same scale.
    """
    g = frame.astype(jnp.float32)
    for _ in range(_LEVELS):
        g = _blur(g)[::2, ::2]
    return g - _blur(g)


def _default_subband(frame):
    """skvideo's band: steerable level 4; isotropic below its min size."""
    h, w = frame.shape
    if min(h, w) >= 32:
        return steerable_band(frame, level=4, orientation=0)
    return isotropic_subband(frame)


def _est_params(y):
    """GSM local params over 3x3 blocks: (premultipliers s, entropies h)."""
    h, w = y.shape
    hc, wc = (h // _BLK) * _BLK, (w // _BLK) * _BLK
    if hc == 0 or wc == 0:
        # zero blocks -> mean/cov over an empty axis is silent NaN; the
        # frame (after subband decimation) is just too small for STRRED
        raise ValueError(
            f"subband {h}x{w} has no full {_BLK}x{_BLK} blocks — frames "
            f"are too small for ST-RRED (luma must stay >= "
            f"{_BLK * 8} px after the pyramid's decimation)")
    y = y[:hc, :wc]
    b = (y.reshape(hc // _BLK, _BLK, wc // _BLK, _BLK)
          .transpose(0, 2, 1, 3).reshape(-1, _BLK * _BLK))
    bc = b - b.mean(axis=0)
    cov = bc.T @ bc / b.shape[0]
    # one symmetric eigendecomposition serves both the eigenvalues and
    # the pseudo-inverse (cov is PSD)
    lam_raw, vec = jnp.linalg.eigh(cov)
    lam = jnp.clip(lam_raw, 0.0)
    inv_lam = jnp.where(lam > 1e-12 * jnp.max(lam), 1.0 / lam, 0.0)
    cinv = (vec * inv_lam[None, :]) @ vec.T
    ss = jnp.clip(jnp.einsum("ni,ij,nj->n", bc, cinv, bc) / (_BLK * _BLK), 0.0)
    ent = 0.5 * jnp.sum(
        jnp.log2(2.0 * jnp.pi * jnp.e * (ss[:, None] * lam[None, :] + _SIGMA_NSQ)),
        axis=1)
    return ss, ent


def _extract_info(frame1, frame2, subband_fn=None):
    """Scaled spatial/temporal entropy fields for one frame pair."""
    sb = subband_fn or _default_subband
    y = sb(frame1)
    yd = sb(frame1 - frame2)
    ss, ent = _est_params(y)
    ssd, entd = _est_params(yd)
    spatial = ent * jnp.log2(1.0 + ss)
    temporal = entd * jnp.log2(1.0 + ss) * jnp.log2(1.0 + ssd)
    return spatial, temporal


from functools import partial


@partial(jax.jit, static_argnums=(2,))
def _strred_pairs(ref, dis, subband_fn=None):
    def one(r0, r1, d0, d1):
        sp_r, tp_r = _extract_info(r0, r1, subband_fn)
        sp_d, tp_d = _extract_info(d0, d1, subband_fn)
        return (jnp.mean(jnp.abs(sp_r - sp_d)),
                jnp.mean(jnp.abs(tp_r - tp_d)),
                jnp.abs(jnp.mean(sp_r) - jnp.mean(sp_d)),
                jnp.abs(jnp.mean(tp_r) - jnp.mean(tp_d)))

    return jax.vmap(one)(ref[:-1], ref[1:], dis[:-1], dis[1:])


def strred(reference, distorted, subband_fn=None):
    """ST-RRED for (T, H, W) grayscale clips in [0, 1], T >= 2.

    ``subband_fn``: optional (H, W) -> coefficients extractor replacing
    the default analytic steerable band (level 4, first orientation —
    skvideo's choice; module docstring).  Must be jit-traceable.

    Returns ``(per_frame, strred, strredsn)`` — the same triple shape the
    reference unpacks from skvideo (``util/index.py:88``): ``per_frame``
    is a (T-1, 2) array of per-pair (spatial, temporal) RRED indexes,
    ``strred`` = mean(spatial) * mean(temporal), and ``strredsn`` the
    single-number (field-mean-first) variant.
    """
    ref = jnp.asarray(reference, jnp.float32)
    dis = jnp.asarray(distorted, jnp.float32)
    if ref.ndim != 3 or ref.shape != dis.shape:
        raise ValueError(f"expected matching (T, H, W) clips, got "
                         f"{ref.shape} vs {dis.shape}")
    if ref.shape[0] < 2:
        raise ValueError("ST-RRED needs at least 2 frames")
    srred, trred, srred_sn, trred_sn = _strred_pairs(ref, dis, subband_fn)
    per_frame = jnp.stack([srred, trred], axis=1)
    return (per_frame,
            float(jnp.mean(srred) * jnp.mean(trred)),
            float(jnp.mean(srred_sn) * jnp.mean(trred_sn)))
