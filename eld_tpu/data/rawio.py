"""Raw file access: native TIFF/EXIF decoder binding + packed fallbacks.

``RawFile`` exposes the surface the reference gets from its customized
rawpy/LibRaw (``util/process.py:86-129``, ``dataset/sid_dataset.py:
172-196``): the visible mosaic, per-channel black level, white level, CFA
pattern, camera white balance, the ``rgb_camera_matrix``-equivalent CCM,
and EXIF iso/exposure.

Backends, tried in order:
  1. native librawio (C++, ``native/rawio``) for TIFF-container raws with
     uncompressed/packed mosaics (.dng and uncompressed .ARW/.NEF);
  2. ``.npz`` rawpacks — a simple open format for pre-decoded raws
     (mosaic + metadata), produced by ``eld_tpu.tools.convert_raw`` on a
     machine that has LibRaw, or by tests/fixtures.

Vendor-compressed payloads (e.g. Sony ARW 2.3 lossy) are reported with a
clear error naming the pre-conversion path.
"""

from __future__ import annotations

import ctypes
import os
from dataclasses import dataclass
from typing import Optional

import numpy as onp

from eld_tpu.core.packing import pack_bayer, pack_xtrans

_NATIVE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "data_files", "native", "librawio.so"
)

RIO_E_UNSUPPORTED_COMPRESSION = -3


def _load_native():
    if not os.path.exists(_NATIVE_PATH):
        return None
    try:
        lib = ctypes.CDLL(_NATIVE_PATH)
    except OSError:
        return None
    lib.rio_open.restype = ctypes.c_void_p
    lib.rio_open.argtypes = [ctypes.c_char_p]
    for fn in ("rio_iso", "rio_exposure", "rio_white_level"):
        getattr(lib, fn).restype = ctypes.c_double
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ("rio_width", "rio_height", "rio_compression", "rio_bits"):
        getattr(lib, fn).restype = ctypes.c_uint32
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.rio_black_level.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    lib.rio_cfa_pattern.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.rio_wb.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    lib.rio_ccm.restype = ctypes.c_int
    lib.rio_ccm.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    lib.rio_read_raw.restype = ctypes.c_int
    lib.rio_read_raw.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16)]
    lib.rio_close.argtypes = [ctypes.c_void_p]
    return lib


_LIB = _load_native()

WHITE_POINT = 16383


@dataclass
class RawFile:
    """Decoded raw: mosaic + the metadata the pipeline consumes."""

    mosaic: onp.ndarray            # (H, W) uint16 visible area
    black_level: onp.ndarray       # (4,) per channel (CFA cell order)
    white_level: float
    cfa_pattern: onp.ndarray       # (2, 2) codes 0=R 1=G 2=B 3=G2
    wb: onp.ndarray                # (4,) RGBG camera white balance gains
    ccm: onp.ndarray               # (3, 3) cam -> sRGB matrix
    iso: float
    exposure: float
    cfa: str = "bayer"

    def pattern_offsets(self):
        """(row, col) of R, G1, B, G2 inside the 2x2 CFA cell — the
        pack order contract (reference ``pack_raw_bayer``,
        ``dataset/sid_dataset.py:175-189``)."""
        pat = self.cfa_pattern
        out = []
        for code in (0, 1, 2, 3):
            pos = onp.argwhere(pat == code)
            if len(pos) == 0:  # some files use 1 for both greens
                greens = onp.argwhere(pat == 1)
                pos = greens[1:2] if code == 3 and len(greens) > 1 else pos
            out.append(tuple(int(v) for v in pos[0]))
        return tuple(out)

    def packed(self) -> onp.ndarray:
        """Black/white-normalized packed planes in [0,1], channels-last —
        the reference's ``pack_raw_bayer`` / ``pack_raw_xtrans`` output."""
        if self.cfa == "bayer":
            offs = self.pattern_offsets()
            out = pack_bayer(self.mosaic.astype(onp.float32), offsets=offs)
            black = self.black_level.reshape(1, 1, 4).astype(onp.float32)
            out = (out - black) / (self.white_level - black)
        else:
            im = (self.mosaic.astype(onp.float32) - 1024.0) / (self.white_level - 1024.0)
            out = pack_xtrans(im)
        return onp.clip(out, 0.0, 1.0)


class UnsupportedRawError(RuntimeError):
    pass


def _open_native(path: str) -> RawFile:
    h = _LIB.rio_open(path.encode())
    if not h:
        raise UnsupportedRawError(f"rawio could not parse {path}")
    try:
        comp = _LIB.rio_compression(h)
        W, H = _LIB.rio_width(h), _LIB.rio_height(h)
        mosaic = onp.empty((H, W), onp.uint16)
        rc = _LIB.rio_read_raw(h, mosaic.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
        if rc == RIO_E_UNSUPPORTED_COMPRESSION:
            raise UnsupportedRawError(
                f"{path}: vendor-compressed raw (compression={comp}); convert to "
                "uncompressed DNG first (eld_tpu.tools.convert_raw, or "
                "'dnglab convert' / Adobe DNG Converter with compression off)")
        if rc != 0:
            raise UnsupportedRawError(f"{path}: raw decode failed (rc={rc})")
        black = (ctypes.c_double * 4)()
        _LIB.rio_black_level(h, black)
        cfa = (ctypes.c_uint8 * 4)()
        _LIB.rio_cfa_pattern(h, cfa)
        wb = (ctypes.c_double * 4)()
        _LIB.rio_wb(h, wb)
        ccm = (ctypes.c_double * 9)()
        _LIB.rio_ccm(h, ccm)
        white = _LIB.rio_white_level(h) or WHITE_POINT
        return RawFile(
            mosaic=mosaic,
            black_level=onp.asarray(black, onp.float32),
            white_level=float(white),
            cfa_pattern=onp.asarray(cfa, onp.uint8).reshape(2, 2),
            wb=onp.asarray(wb, onp.float32),
            ccm=onp.asarray(ccm, onp.float64).reshape(3, 3).astype(onp.float32),
            iso=_LIB.rio_iso(h),
            exposure=_LIB.rio_exposure(h),
        )
    finally:
        _LIB.rio_close(h)


def _open_rawpack(path: str) -> RawFile:
    z = onp.load(path, allow_pickle=False)
    return RawFile(
        mosaic=onp.asarray(z["mosaic"], onp.uint16),
        black_level=onp.asarray(z["black_level"], onp.float32).reshape(-1)[:4],
        white_level=float(z.get("white_level", WHITE_POINT)),
        cfa_pattern=onp.asarray(z.get("cfa_pattern", [[0, 1], [3, 2]]), onp.uint8),
        wb=onp.asarray(z.get("wb", [1, 1, 1, 1]), onp.float32),
        ccm=onp.asarray(z.get("ccm", onp.eye(3)), onp.float32),
        iso=float(z.get("iso", 100.0)),
        exposure=float(z.get("exposure", 1.0)),
        cfa=str(z.get("cfa", "bayer")),
    )


def save_rawpack(path: str, raw: RawFile):
    onp.savez_compressed(
        path,
        mosaic=raw.mosaic,
        black_level=raw.black_level,
        white_level=raw.white_level,
        cfa_pattern=raw.cfa_pattern,
        wb=raw.wb,
        ccm=raw.ccm,
        iso=raw.iso,
        exposure=raw.exposure,
        cfa=raw.cfa,
    )


def imread(path: str) -> RawFile:
    """Open a raw file; resolves backend by extension/availability."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if path.endswith((".npz", ".rawpack")):
        return _open_rawpack(path)
    if _LIB is None:
        raise UnsupportedRawError(
            "native librawio not built (run `make -C native`) and "
            f"{path} is not a .npz rawpack")
    return _open_native(path)


def metainfo(path: str):
    """(iso, exposure) pair — parity with ``sid_dataset.py:21-34``."""
    raw = imread(path)
    return raw.iso, raw.exposure
