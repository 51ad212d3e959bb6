"""Synthesize a minimal DNG-style TIFF for exercising the rawio parser.

Layout: IFD0 (ColorMatrix2, AsShotNeutral, ExifIFD ptr, SubIFDs ptr)
-> SubIFD with the CFA frame (uncompressed 16-bit strips + DNG levels)
-> ExifIFD with ISO and ExposureTime. All little-endian, classic TIFF.
"""

import struct

import numpy as onp

T_BYTE, T_ASCII, T_SHORT, T_LONG, T_RATIONAL, T_SRATIONAL = 1, 2, 3, 4, 5, 10


class TiffBuilder:
    def __init__(self):
        self.buf = bytearray(b"II*\x00\x00\x00\x00\x00")  # header; IFD0 ptr @4

    def tell(self):
        return len(self.buf)

    def put(self, data: bytes) -> int:
        off = len(self.buf)
        self.buf += data
        return off

    def ifd(self, entries, next_off=0) -> int:
        """entries: list of (tag, type, count, packed_value_bytes_or_offset)."""
        off = len(self.buf)
        self.buf += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in sorted(entries):
            self.buf += struct.pack("<HHI", tag, typ, cnt)
            if isinstance(val, bytes):
                assert len(val) <= 4
                self.buf += val.ljust(4, b"\x00")
            else:
                self.buf += struct.pack("<I", val)
        self.buf += struct.pack("<I", next_off)
        return off

    def patch_u32(self, at: int, value: int):
        self.buf[at : at + 4] = struct.pack("<I", value)


def short(v):
    return struct.pack("<H", v)


def long_(v):
    return struct.pack("<I", v)


def make_dng(mosaic: onp.ndarray, iso=1600, exposure=0.1,
             black=(512, 512, 512, 512), white=16383,
             cfa=(0, 1, 1, 2), wb_neutral=(0.5, 1.0, 0.6),
             ccm=None, active_area=None) -> bytes:
    """mosaic: (H, W) uint16 -> serialized little-endian TIFF bytes.

    ``cfa`` may be 4 codes (2x2 Bayer) or 36 codes (6x6 X-Trans); the
    latter adds a CFARepeatPatternDim tag.  ``active_area`` is an optional
    (top, left, bottom, right) DNG ActiveArea rectangle (bottom/right
    exclusive) written as tag 0xC68D; per the DNG spec the ``cfa`` pattern
    then describes the phase AT the active origin, and ``mosaic`` is the
    full stored frame including the masked borders."""
    h, w = mosaic.shape
    b = TiffBuilder()

    strip_off = b.put(mosaic.astype("<u2").tobytes())
    black_off = b.put(b"".join(struct.pack("<II", v, 1) for v in black))
    cfa_bytes = bytes(cfa)

    sub_entries = [
        (0x00FE, T_LONG, 1, long_(0)),            # NewSubfileType: main image
        (0x0100, T_LONG, 1, long_(w)),
        (0x0101, T_LONG, 1, long_(h)),
        (0x0102, T_SHORT, 1, short(16)),
        (0x0103, T_SHORT, 1, short(1)),           # uncompressed
        (0x0106, T_SHORT, 1, short(32803)),       # CFA
        (0x0111, T_LONG, 1, long_(strip_off)),
        (0x0116, T_LONG, 1, long_(h)),
        (0x0117, T_LONG, 1, long_(mosaic.nbytes)),
        (0xC61A, T_RATIONAL, 4, black_off),       # BlackLevel
        (0xC61D, T_LONG, 1, long_(white)),        # WhiteLevel
    ]
    if active_area is not None:
        aa_off = b.put(b"".join(struct.pack("<I", int(v)) for v in active_area))
        sub_entries.append((0xC68D, T_LONG, 4, long_(aa_off)))
    if len(cfa_bytes) == 4:
        sub_entries.append((0x828E, T_BYTE, 4, cfa_bytes))
    else:
        assert len(cfa_bytes) == 36
        cfa_off = b.put(cfa_bytes)
        sub_entries.append((0x828D, T_SHORT, 2, short(6) + short(6)))
        sub_entries.append((0x828E, T_BYTE, 36, long_(cfa_off)))
    sub_off = b.ifd(sub_entries)

    exp_num, exp_den = int(exposure * 10_000), 10_000
    expo_off = b.put(struct.pack("<II", exp_num, exp_den))
    exif_entries = [
        (0x8827, T_SHORT, 1, short(iso)),
        (0x829A, T_RATIONAL, 1, expo_off),
    ]
    exif_off = b.ifd(exif_entries)

    neutral_off = b.put(
        b"".join(struct.pack("<II", int(v * 10_000), 10_000) for v in wb_neutral))
    if ccm is None:
        ccm = onp.eye(3)
    ccm_off = b.put(
        b"".join(struct.pack("<ii", int(v * 10_000), 10_000) for v in onp.ravel(ccm)))

    ifd0_entries = [
        (0x00FE, T_LONG, 1, long_(1)),            # reduced-res placeholder
        (0x0100, T_LONG, 1, long_(16)),
        (0x0101, T_LONG, 1, long_(16)),
        (0x014A, T_LONG, 1, long_(sub_off)),      # SubIFDs
        (0x8769, T_LONG, 1, long_(exif_off)),     # ExifIFD
        (0xC622, T_SRATIONAL, 9, ccm_off),        # ColorMatrix2
        (0xC628, T_RATIONAL, 3, neutral_off),     # AsShotNeutral
    ]
    ifd0_off = b.ifd(ifd0_entries)
    b.patch_u32(4, ifd0_off)
    return bytes(b.buf)
