"""Synthesize a minimal Nikon NEF (lossless, D850-style) for the decoder.

Contains a NEF bitstream ENCODER implementing the public format spec
(dcraw/LibRaw's nikon_load_raw semantics): Huffman-coded DPCM with the
constant per-bit-depth code tables, column-0/1 vertical predictors seeded
from the maker-note linearization table, column-parity horizontal
prediction elsewhere, and T.81-style sign coding.  Lossless (version byte
0x46) means decode must reproduce the mosaic bit-exactly.

Container: TIFF with the raw in a SubIFD (Compression=34713); the Nikon
maker note is "Nikon\\0" + version + an EMBEDDED TIFF whose value offsets
are relative to the embedded header (tag 0x96 = linearization table,
0x3D = per-channel black level).
"""

import struct

import numpy as onp

from tests.tiff_fixture import TiffBuilder, T_BYTE, T_SHORT, T_LONG, T_RATIONAL

T_UNDEF = 7

# the 14- and 12-bit lossless "nikon tree" tables (format constants):
# 16 code-length counts then the values in canonical order
NEF_TREE_14 = ([0, 1, 4, 2, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0],
               [7, 6, 8, 5, 9, 4, 10, 3, 11, 12, 2, 0, 1, 13, 14])
NEF_TREE_12 = ([0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0],
               [5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12])


def canonical_codes(counts, values):
    codes = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc, self.n = 0, 0

    def flush(self):
        if self.n:
            self.put(0, 8 - self.n)
        return bytes(self.out)


def encode_nef_bitstream(mosaic, vpred, bits=14):
    """mosaic: (H, W) uint16; vpred: [[v00, v01], [v10, v11]]."""
    counts, values = NEF_TREE_14 if bits == 14 else NEF_TREE_12
    codes = canonical_codes(counts, values)
    h, w = mosaic.shape
    m = mosaic.astype(onp.int64)
    vp = [list(row) for row in vpred]
    hp = [0, 0]
    bw = BitWriter()
    for row in range(h):
        for col in range(w):
            val = int(m[row, col])
            if col < 2:
                pred = vp[row & 1][col]
                vp[row & 1][col] = val
            else:
                pred = hp[col & 1]
            hp[col & 1] = val
            diff = val - pred
            ln = 0 if diff == 0 else max(diff, -diff).bit_length()
            assert ln <= bits, "diff exceeds the tree's classes"
            code, nb = codes[ln]
            bw.put(code, nb)
            if ln:
                bw.put(diff if diff >= 0 else diff + (1 << ln) - 1, ln)
    return bw.flush()


def make_nikon_makernote(vpred, black=(400, 401, 402, 403), ver=(0x46, 0x30),
                         bits=14):
    """'Nikon\\0' + version + embedded TIFF with tags 0x3D and 0x96."""
    # embedded TIFF layout: header(8) + IFD(2 + 2*12 + 4 = 30) + values
    black_off = 38
    meta_off = black_off + 8
    ifd = struct.pack("<H", 2)
    ifd += struct.pack("<HHI", 0x003D, T_SHORT, 4) + struct.pack("<I", black_off)
    meta = bytes(ver) + b"".join(struct.pack("<H", v)
                                 for row in vpred for v in row)
    meta += struct.pack("<H", 0)  # curve size (ignored for lossless)
    ifd += struct.pack("<HHI", 0x0096, T_UNDEF, len(meta)) + struct.pack("<I", meta_off)
    ifd += struct.pack("<I", 0)
    embedded = b"II*\x00" + struct.pack("<I", 8) + ifd
    embedded += b"".join(struct.pack("<H", v) for v in black)
    embedded += meta
    return b"Nikon\x00\x02\x11\x00\x00" + embedded


def make_nef(rng, size=(8, 32), iso=640, exposure=0.05, bits=14,
             vpred=(8192, 8200, 8100, 8300), black=(400, 401, 402, 403),
             ver=(0x46, 0x30)) -> (bytes, onp.ndarray):
    """Full minimal .nef bytes + the mosaic it encodes (lossless)."""
    h, w = size
    mosaic = rng.integers(black[0], 1 << bits, (h, w)).astype(onp.uint16)
    vp = [[vpred[0], vpred[1]], [vpred[2], vpred[3]]]
    stream = encode_nef_bitstream(mosaic, vp, bits)

    b = TiffBuilder()
    strip_off = b.put(stream)
    mk_off = b.put(make_nikon_makernote(vp, black, ver, bits))

    sub_entries = [
        (0x0100, T_LONG, 1, struct.pack("<I", w)),
        (0x0101, T_LONG, 1, struct.pack("<I", h)),
        (0x0102, T_SHORT, 1, struct.pack("<H", bits)),
        (0x0103, T_SHORT, 1, struct.pack("<H", 34713)),  # Nikon compressed
        (0x0106, T_SHORT, 1, struct.pack("<H", 32803)),  # CFA
        (0x0111, T_LONG, 1, struct.pack("<I", strip_off)),
        (0x0116, T_LONG, 1, struct.pack("<I", h)),
        (0x0117, T_LONG, 1, struct.pack("<I", len(stream))),
        (0x828E, T_BYTE, 4, bytes((0, 1, 1, 2))),        # RGGB
    ]
    sub_off = b.ifd(sub_entries)

    expo_off = b.put(struct.pack("<II", int(exposure * 100_000), 100_000))
    exif_off = b.ifd([
        (0x8827, T_SHORT, 1, struct.pack("<H", iso)),
        (0x829A, T_RATIONAL, 1, struct.pack("<I", expo_off)),
        (0x927C, T_UNDEF, 64, struct.pack("<I", mk_off)),
    ])

    ifd0 = b.ifd([
        (0x00FE, T_LONG, 1, struct.pack("<I", 1)),
        (0x014A, T_LONG, 1, struct.pack("<I", sub_off)),
        (0x8769, T_LONG, 1, struct.pack("<I", exif_off)),
    ])
    b.patch_u32(4, ifd0)
    return bytes(b.buf), mosaic
