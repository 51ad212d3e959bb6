"""Synthesize a minimal Sony ARW 2.3 file for exercising the native decoder.

The ARW2 bitstream ENCODER lives here (the framework only ever decodes):
random valid 16-byte blocks are generated together with their exact
expected pixel values, computed by an independent Python twin of the
format spec — so the C++ decoder is validated against the documented
format, not against itself.

Format recap (public: dcraw/LibRaw sony_arw2 semantics + RawDigger ARW2
analyses): each row is ``width`` bytes; a 16-byte block holds 16 pixels of
one Bayer color phase (even or odd columns of a 32-column span):

    u32 LE header: max(11) | min(11)<<11 | imax(4)<<22 | imin(4)<<26
    fourteen 7-bit deltas from bit 30;  sh = smallest s<4 with
    (0x80<<s) > max-min;  pix = clip(min + (delta<<sh), max 0x7ff)

The 11-bit values expand through a piecewise-linear curve (slopes
1,2,4,8,16 over the 12-bit domain) whose interior knots ship IN THE FILE
(Sony maker-note tag 0x7010, knot = (value>>2) & 0xfff):
out14 = curve[pix<<1] >> 2.
"""

import struct

import numpy as onp

from tests.tiff_fixture import TiffBuilder, T_SHORT, T_LONG, T_BYTE, T_RATIONAL

T_UNDEF = 7


def build_curve(knots4):
    """12-bit-domain expansion curve with slopes 1,2,4,8,16 between
    {0, k1..k4, 4095}."""
    kn = [0] + [int(k) for k in knots4] + [4095]
    curve = onp.zeros(4096, onp.uint32)
    for seg in range(5):
        for j in range(kn[seg] + 1, kn[seg + 1] + 1):
            curve[j] = curve[j - 1] + (1 << seg)
    return curve


def pack_block(minv, maxv, imin, imax, deltas):
    """Serialize one 16-byte ARW2 block."""
    assert imin != imax and len(deltas) == 14
    acc = (maxv & 0x7FF) | ((minv & 0x7FF) << 11) | ((imax & 0xF) << 22) | (
        (imin & 0xF) << 26)
    bit = 30
    k = 0
    for i in range(16):
        if i == imax or i == imin:
            continue
        acc |= (int(deltas[k]) & 0x7F) << bit
        bit += 7
        k += 1
    return acc.to_bytes(16, "little")


def decode_block(block):
    """Independent Python twin of the block spec -> 16 pixel values."""
    acc = int.from_bytes(block, "little")
    val = acc & 0xFFFFFFFF
    maxv, minv = val & 0x7FF, (val >> 11) & 0x7FF
    imax, imin = (val >> 22) & 0xF, (val >> 26) & 0xF
    sh = 0
    while sh < 4 and (0x80 << sh) <= maxv - minv:
        sh += 1
    pix, bit = [], 30
    for i in range(16):
        if i == imax:
            pix.append(maxv)
        elif i == imin:
            pix.append(minv)
        else:
            pix.append(min(0x7FF, (((acc >> bit) & 0x7F) << sh) + minv))
            bit += 7
    return pix


def random_block(rng):
    """A random block whose (min, max) is consistent with every shift class."""
    sh = int(rng.integers(0, 5))
    if sh == 0:
        diff = int(rng.integers(0, 0x80))
    elif sh < 4:
        diff = int(rng.integers(0x80 << (sh - 1), min(0x80 << sh, 0x800)))
    else:
        diff = int(rng.integers(0x400, 0x800))
    minv = int(rng.integers(0, 0x800 - diff))
    maxv = minv + diff
    imax, imin = (int(v) for v in rng.choice(16, 2, replace=False))
    deltas = rng.integers(0, 128, 14)
    return pack_block(minv, maxv, imin, imax, deltas)


def make_arw2_strip(rng, width, height, knots):
    """Random compressed strip + the exact expected decoded mosaic."""
    assert width % 32 == 0, "fixture uses 32-aligned widths"
    curve = build_curve(knots)
    strip = bytearray()
    expected = onp.zeros((height, width), onp.uint16)
    for row in range(height):
        col = 0
        while col + 30 < width:  # mirrors the decoder's column walk
            blk = random_block(rng)
            strip += blk
            for p in decode_block(blk):
                expected[row, col] = curve[p << 1] >> 2
                col += 2
            col -= 1 if (col & 1) else 31
    assert len(strip) == width * height
    return bytes(strip), expected


def make_arw(rng, width=64, height=8, iso=800, exposure=0.04,
             knots=(1000, 2000, 3000, 3600), black=(512, 513, 515, 514),
             wb_rggb=(2048, 1024, 1024, 1560), white=16383,
             with_curve_tag=True, with_black_tag=True) -> (bytes, onp.ndarray):
    """Full minimal .ARW file bytes + expected decoded mosaic.

    black is given in PACKED channel order (R, G1, B, G2); the maker-note
    tag 0x7310 stores CFA-cell row-major (R, G1, G2, B) for the Sony RGGB
    mosaic, so the tag gets (black[0], black[1], black[3], black[2]).
    """
    strip, expected = make_arw2_strip(
        rng, width, height, knots if with_curve_tag else (0, 0, 0, 0))
    b = TiffBuilder()
    strip_off = b.put(strip)

    sub_entries = [
        (0x00FE, T_LONG, 1, struct.pack("<I", 0)),
        (0x0100, T_LONG, 1, struct.pack("<I", width)),
        (0x0101, T_LONG, 1, struct.pack("<I", height)),
        (0x0102, T_SHORT, 1, struct.pack("<H", 8)),
        (0x0103, T_SHORT, 1, struct.pack("<H", 32767)),   # Sony ARW2
        (0x0106, T_SHORT, 1, struct.pack("<H", 32803)),   # CFA
        (0x0111, T_LONG, 1, struct.pack("<I", strip_off)),
        (0x0116, T_LONG, 1, struct.pack("<I", height)),
        (0x0117, T_LONG, 1, struct.pack("<I", len(strip))),
        (0x828E, T_BYTE, 4, bytes((0, 1, 1, 2))),         # RGGB
    ]
    sub_off = b.ifd(sub_entries)

    # Sony maker note: plain IFD, file-absolute value offsets
    mk_entries = []
    if with_curve_tag:
        curve_off = b.put(b"".join(struct.pack("<H", k << 2) for k in knots))
        mk_entries.append((0x7010, T_SHORT, 4, struct.pack("<I", curve_off)))
    if with_black_tag:
        tag_black = (black[0], black[1], black[3], black[2])  # packed->cell
        black_off = b.put(b"".join(struct.pack("<H", v) for v in tag_black))
        mk_entries.append((0x7310, T_SHORT, 4, struct.pack("<I", black_off)))
    wb_off = b.put(b"".join(struct.pack("<H", v) for v in wb_rggb))
    mk_entries.append((0x7313, T_SHORT, 4, struct.pack("<I", wb_off)))
    mk_entries.append((0x787F, T_SHORT, 1, struct.pack("<H", white)))
    mk_off = b.ifd(mk_entries)

    expo_off = b.put(struct.pack("<II", int(exposure * 10_000), 10_000))
    exif_entries = [
        (0x8827, T_SHORT, 1, struct.pack("<H", iso)),
        (0x829A, T_RATIONAL, 1, struct.pack("<I", expo_off)),
        (0x927C, T_UNDEF, 64, struct.pack("<I", mk_off)),  # MakerNote
    ]
    exif_off = b.ifd(exif_entries)

    ifd0_entries = [
        (0x00FE, T_LONG, 1, struct.pack("<I", 1)),
        (0x014A, T_LONG, 1, struct.pack("<I", sub_off)),
        (0x8769, T_LONG, 1, struct.pack("<I", exif_off)),
    ]
    ifd0_off = b.ifd(ifd0_entries)
    b.patch_u32(4, ifd0_off)
    return bytes(b.buf), expected
