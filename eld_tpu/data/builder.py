"""Offline dataset builder — packs raw files into PatchStore databases.

Mirrors the reference's LMDB builder recipes (``util/lmdb_data.py``):
pack -> [x exposure ratio] -> [raw->sRGB with optional CRF] -> clip ->
uint16 -> center-crop to the stride grid -> non-overlapping patch
extraction -> append; per-patch (wb, ccm) metadata goes to the aux
sidecar (the ``meta_info.pkl`` analog).

Also provides the offline noise-baking recipe (the reference's
``SID_Sony_syn_Raw_<camera>.db``, consumed at ``train_syn.py:66-70``)
using the host twin of the noise model.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Optional, Sequence

import numpy as onp

from eld_tpu.data import rawio
from eld_tpu.data.pairs import compute_expo_ratio, sid_pairs
from eld_tpu.data.patchstore import PatchStoreWriter


def extract_patches(img: onp.ndarray, patch: int, stride: int) -> onp.ndarray:
    """(H, W, C) -> (N, patch, patch, C) grid patches, center-aligned
    (the builder's crop-to-grid + Data2Volume, lmdb_data.py:108-151)."""
    H, W, C = img.shape
    # images smaller than a patch yield ZERO patches — floor division of
    # a negative numerator would otherwise compute ny/nx = -1 and emit
    # one patch of uninitialized memory
    ny = max((H - patch) // stride + 1, 0)
    nx = max((W - patch) // stride + 1, 0)
    crop_h = (ny - 1) * stride + patch
    crop_w = (nx - 1) * stride + patch
    y0 = (H - crop_h) // 2
    x0 = (W - crop_w) // 2
    img = img[y0 : y0 + crop_h, x0 : x0 + crop_w]
    out = onp.empty((ny * nx, patch, patch, C), img.dtype)
    k = 0
    for iy in range(ny):
        for ix in range(nx):
            out[k] = img[iy * stride : iy * stride + patch,
                         ix * stride : ix * stride + patch]
            k += 1
    return out


def build_patch_db(
    fns: Sequence[str],
    targetdir: str,
    patch: int = 512,
    stride: int = 512,
    channels: int = 4,
    ratios: Optional[Sequence[float]] = None,
    srgb: bool = False,
    crf=None,
    uint16: bool = True,
    noise_maker=None,
    verbose: bool = True,
):
    """Pack raw files into a PatchStore at ``targetdir`` (dir is created)."""
    if os.path.exists(join(targetdir, "data.bin")):
        raise FileExistsError(f"database already exists: {targetdir}")
    out_ch = 3 if srgb else channels
    dtype = onp.uint16 if uint16 else onp.float32

    with PatchStoreWriter(targetdir, (patch, patch, out_ch), dtype=dtype) as w:
        for i, fn in enumerate(fns):
            raw = rawio.imread(fn)
            x = raw.packed()
            wb = raw.wb / raw.wb[1]
            ccm = raw.ccm
            if ratios is not None:
                x = x * ratios[i]
            if noise_maker is not None:
                x = noise_maker(x)
            if srgb:
                from eld_tpu.data.datasets import _srgb

                x = _srgb(x, wb, ccm, crf)
            x = onp.clip(x, 0.0, 1.0)
            # clipped floats go straight to append(): the writer's own
            # float->uint16 path rounds symmetrically (rint), while a
            # manual (x*65535).astype cast would truncate — a systematic
            # half-LSB downward bias and a second quantization semantic
            n_before = w._count
            for p in extract_patches(x, patch, stride):
                w.append(p, wb=wb, ccm=ccm)
            if w._count == n_before and verbose:
                print(f"[w] {fn}: image smaller than patch size {patch}, skipped")
            if verbose:
                print(f"packed ({i + 1}/{len(fns)}): {fn} -> {w._count} patches total")
        if w._count == 0:
            raise ValueError(
                f"no patches produced: every input is smaller than patch={patch}")
    return targetdir


def _train_long_fns(sourcedir, num_samples=None):
    fns = sorted({fn[1] for fn in sid_pairs("train")})
    fns = [join(sourcedir, "long", fn) for fn in fns]
    return fns[:num_samples] if num_samples else fns


def create_sony_dataset(sourcedir, destdir, num_samples=None, patch=512, stride=512):
    """Clean long-exposure patches (reference create_sony_dataset, 232-248)."""
    return build_patch_db(_train_long_fns(sourcedir, num_samples),
                          join(destdir, "SID_Sony_Raw.eps"),
                          patch=patch, stride=stride)


def create_sony_dataset_paired(sourcedir, destdir, num_samples=None):
    """Paired (input x ratio, target) stores (reference 251-272)."""
    fns = sorted(sid_pairs("train"))
    if num_samples:
        fns = fns[:num_samples]
    ratios = [compute_expo_ratio(a, b) for a, b in fns]
    build_patch_db([join(sourcedir, "short", a) for a, _ in fns],
                   join(destdir, "SID_Sony_input_Raw.eps"), ratios=ratios)
    build_patch_db([join(sourcedir, "long", b) for _, b in fns],
                   join(destdir, "SID_Sony_target_Raw.eps"))


def create_sony_dataset_srgb(sourcedir, destdir, num_samples=None, use_crf=True):
    """sRGB-domain clean patches with the calibrated CRF (reference 275-303)."""
    crf = None
    if use_crf:
        from eld_tpu.core.emor import load_crf

        crf = load_crf()
    name = "SID_Sony_SRGB_CRF.eps" if use_crf else "SID_Sony_SRGB.eps"
    return build_patch_db(_train_long_fns(sourcedir, num_samples),
                          join(destdir, name), srgb=True, crf=crf)


def create_sony_syn_dataset(sourcedir, destdir, camera_include: int,
                            noise_model: str = "g", num_samples=None, seed: int = 2019):
    """Offline-baked noisy patches per camera — the reference's
    SID_Sony_syn_Raw_<camera> recipe (train.sh documents the 0.1-0.3 dB
    cost vs online synthesis; the TPU path trains online by default)."""
    from eld_tpu.noise.host import HostNoiseModel
    from eld_tpu.noise.params import CAMERA_NAMES

    camera = CAMERA_NAMES[camera_include]
    nm = HostNoiseModel(model=noise_model, include=camera_include,
                        rng=onp.random.default_rng(seed))
    return build_patch_db(
        _train_long_fns(sourcedir, num_samples),
        join(destdir, f"SID_Sony_syn_Raw_{camera}.eps"),
        noise_maker=nm,
    )
