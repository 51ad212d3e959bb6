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

Documented deviation from skvideo: the subband extractor.  skvideo uses
a band of Simoncelli's sp5Filters steerable pyramid; those filter
constants are numerically-designed tables (matlabPyrTools sp5Filters.m),
verified unreachable in this environment — no skvideo/pyrtools install,
no copy anywhere on disk, and no network egress to fetch them — so the
subband here is an isotropic bandpass at the same scale (3 binomial
blur+decimate steps, then center-minus-blur).  The extractor is
PLUGGABLE (``strred(..., subband_fn=...)``): when the sp5 tables become
available, pass a steerable-band extractor and the skvideo-comparable
variant needs no other change.  The entropic-differencing core — the
metric itself — follows the paper; absolute values are therefore NOT
comparable to skvideo's, but orderings (more distortion -> larger
ST-RRED) are, which is what the metric is used for.  The papers'
reported results use PSNR/SSIM only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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


def _subband(frame):
    """Coarse-scale bandpass coefficients of one (H, W) frame."""
    g = frame.astype(jnp.float32)
    for _ in range(_LEVELS):
        g = _blur(g)[::2, ::2]
    return g - _blur(g)


def _est_params(y):
    """GSM local params over 3x3 blocks: (premultipliers s, entropies h)."""
    h, w = y.shape
    hc, wc = (h // _BLK) * _BLK, (w // _BLK) * _BLK
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
    sb = subband_fn or _subband
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
    the default isotropic bandpass (the hook for an sp5 steerable band,
    see module docstring).  Must be jit-traceable.

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
