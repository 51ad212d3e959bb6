"""CFA <-> planar packing.

Converts color-filter-array mosaics into planar multi-channel images and
back.  Channel conventions follow the ELD reference so calibrated noise
parameters and metrics line up:

  * Bayer  -> 4 channels in (R, G1, B, G2) order
    (reference: ``dataset/sid_dataset.py:172-196`` / ``noise.py:10-20``);
  * X-Trans -> 9 channels on a 6x6 super-cell
    (reference: ``noise.py:22-64``).

All functions here are layout-polymorphic over the array namespace: pass
``xp=numpy`` for the host data pipeline or ``xp=jax.numpy`` for on-device
(jit-traceable) use.  Unlike the reference we are channels-LAST (H, W, C),
the natural TPU layout; the trailing small channel dim vectorizes onto VPU
lanes and keeps conv layouts NHWC.
"""

from __future__ import annotations

import numpy as onp

WHITE_POINT = 16383  # 14-bit sensors used by SID / ELD


def pack_bayer(cfa, xp=onp, offsets=((0, 0), (0, 1), (1, 1), (1, 0))):
    """Pack an (H, W) Bayer mosaic into (H//2, W//2, 4) planes.

    ``offsets`` gives the (row, col) position inside each 2x2 cell for the
    output channels, default RGGB sensor read in (R, G1, B, G2) channel
    order — identical sampling to the reference's ``pack_raw_bayer``.
    For other CFA orders (derived from a raw file's pattern), pass the
    per-channel offsets for (R, G1, B, G2).
    """
    H = cfa.shape[0] - cfa.shape[0] % 2
    W = cfa.shape[1] - cfa.shape[1] % 2
    planes = [cfa[r:H:2, c:W:2] for (r, c) in offsets]
    return xp.stack(planes, axis=-1).astype(xp.float32)


def unpack_bayer(img, xp=onp, offsets=((0, 0), (0, 1), (1, 1), (1, 0))):
    """Inverse of :func:`pack_bayer`: (h, w, 4) -> (2h, 2w) mosaic."""
    h, w = img.shape[0], img.shape[1]
    H, W = 2 * h, 2 * w
    if xp is onp:
        cfa = onp.zeros((H, W), dtype=onp.float32)
        for ch, (r, c) in enumerate(offsets):
            cfa[r:H:2, c:W:2] = img[..., ch]
        return cfa
    # jnp: build via stack/reshape (functional, jit-friendly).
    # cell[di][dj] = channel whose offset is (di, dj)
    chan_at = {off: ch for ch, off in enumerate(offsets)}
    rows = []
    for di in (0, 1):
        cols = [img[..., chan_at[(di, dj)]] for dj in (0, 1)]
        # interleave columns: (h, w, 2) -> (h, 2w)
        rows.append(xp.stack(cols, axis=-1).reshape(h, W))
    # interleave rows: (h, 2, 2w) -> (2h, 2w)
    return xp.stack(rows, axis=1).reshape(H, W).astype(xp.float32)


# X-Trans 6x6 super-cell sampling map, channel -> list of
# (mosaic_row_offset, mosaic_col_offset, out_row_parity, out_col_parity).
# Channels 0..4 sample 4 positions each into a 2x2 sub-grid of the
# (H//3, W//3) output; channels 5..8 sample one position on a 3x3 grid.
# Matches the reference map (noise.py:31-63).
_XTRANS_QUAD = {
    0: [(0, 0, 0, 0), (0, 4, 0, 1), (3, 1, 1, 0), (3, 3, 1, 1)],  # R
    1: [(0, 2, 0, 0), (0, 5, 0, 1), (3, 2, 1, 0), (3, 5, 1, 1)],  # G
    2: [(0, 1, 0, 0), (0, 3, 0, 1), (3, 0, 1, 0), (3, 4, 1, 1)],  # B
    3: [(1, 2, 0, 0), (2, 5, 0, 1), (5, 2, 1, 0), (4, 5, 1, 1)],  # R
    4: [(2, 2, 0, 0), (1, 5, 0, 1), (4, 2, 1, 0), (5, 5, 1, 1)],  # B
}
_XTRANS_TRI = {5: (1, 0), 6: (1, 1), 7: (2, 0), 8: (2, 1)}  # G planes

# channel -> CFA color code (0=R, 1=G, 2=B) for the 9 packed planes
_XTRANS_CHANNEL_COLOR = {0: 0, 1: 1, 2: 2, 3: 0, 4: 2, 5: 1, 6: 1, 7: 1, 8: 1}


def xtrans_pattern() -> onp.ndarray:
    """The canonical 6x6 X-Trans CFA pattern (codes 0=R 1=G 2=B) that
    :func:`pack_xtrans` assumes, derived from its own sampling maps.
    Files whose visible area starts at a different 6x6 phase must be
    re-phased before packing (see ``RawFile.packed``)."""
    pat = onp.full((6, 6), 255, onp.uint8)
    for ch, quads in _XTRANS_QUAD.items():
        for (mr, mc, _pr, _pc) in quads:
            pat[mr, mc] = _XTRANS_CHANNEL_COLOR[ch]
    for ch, (mr, mc) in _XTRANS_TRI.items():
        for dr in (0, 3):
            for dc in (0, 3):
                pat[mr + dr, mc + dc] = _XTRANS_CHANNEL_COLOR[ch]
    assert not (pat == 255).any()
    return pat


def pack_xtrans(cfa, xp=onp):
    """Pack an (H, W) X-Trans mosaic into (H//3, W//3, 9) planes."""
    H = (cfa.shape[0] // 6) * 6
    W = (cfa.shape[1] // 6) * 6
    h, w = H // 3, W // 3
    if xp is not onp:
        cfa = xp.asarray(cfa)
    chans = []
    for ch in range(9):
        if ch in _XTRANS_QUAD:
            # fill a (h, w) plane whose even/odd rows+cols come from
            # different 6-strided samplings of the mosaic
            quads = {}
            for (mr, mc, pr, pc) in _XTRANS_QUAD[ch]:
                quads[(pr, pc)] = cfa[mr:H:6, mc:W:6]  # (h/2, w/2)
            # interleave 2x2: rows then cols
            top = xp.stack([quads[(0, 0)], quads[(0, 1)]], axis=-1).reshape(h // 2, w)
            bot = xp.stack([quads[(1, 0)], quads[(1, 1)]], axis=-1).reshape(h // 2, w)
            plane = xp.stack([top, bot], axis=1).reshape(h, w)
        else:
            mr, mc = _XTRANS_TRI[ch]
            plane = cfa[mr:H:3, mc:W:3]
        chans.append(plane)
    return xp.stack(chans, axis=-1).astype(xp.float32)


def unpack_xtrans(img, xp=onp):
    """Inverse of :func:`pack_xtrans`: (h, w, 9) -> (3h, 3w) mosaic.

    The jnp path uses functional ``.at[].set`` scatters (static strided
    slices), so it is jit-traceable like the module contract promises —
    the old host round-trip raised TracerArrayConversionError under jit.
    """
    h, w = img.shape[0], img.shape[1]
    H, W = 3 * h, 3 * w
    if xp is onp:
        cfa = onp.zeros((H, W), dtype=onp.float32)
        for ch in range(9):
            if ch in _XTRANS_QUAD:
                for (mr, mc, pr, pc) in _XTRANS_QUAD[ch]:
                    cfa[mr:H:6, mc:W:6] = img[pr::2, pc::2, ch]
            else:
                mr, mc = _XTRANS_TRI[ch]
                cfa[mr:H:3, mc:W:3] = img[..., ch]
        return cfa
    cfa = xp.zeros((H, W), dtype=xp.float32)
    for ch in range(9):
        if ch in _XTRANS_QUAD:
            for (mr, mc, pr, pc) in _XTRANS_QUAD[ch]:
                cfa = cfa.at[mr:H:6, mc:W:6].set(img[pr::2, pc::2, ch])
        else:
            mr, mc = _XTRANS_TRI[ch]
            cfa = cfa.at[mr:H:3, mc:W:3].set(img[..., ch])
    return cfa


def normalize_bayer(packed, black_level, white_point=WHITE_POINT, xp=onp):
    """Black/white-level normalize packed raw to [0, 1].

    ``black_level`` is per-channel, shape (4,) in the packed channel order
    (reference: ``dataset/sid_dataset.py:191-194`` with channels-first there,
    channels-last here).
    """
    black = xp.asarray(black_level, dtype=xp.float32).reshape(1, 1, -1)
    out = (packed - black) / (white_point - black)
    return xp.clip(out, 0.0, 1.0)


def crop_center(img, cropx, cropy):
    """Center crop (..., H, W, C) channels-last image to (cropy, cropx)."""
    y, x = img.shape[-3], img.shape[-2]
    if y < cropy or x < cropx:
        # a negative start would silently wrap into a misaligned short
        # crop and corrupt downstream metrics
        raise ValueError(
            f"crop_center: image {y}x{x} is smaller than the requested "
            f"{cropy}x{cropx} crop (eval items must be at least crop-sized; "
            "pass crop=False for small frames)")
    sx = x // 2 - cropx // 2
    sy = y // 2 - cropy // 2
    return img[..., sy : sy + cropy, sx : sx + cropx, :]
