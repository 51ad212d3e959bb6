"""Synthesize a minimal Canon CR2 file for exercising the native decoder.

Contains a real lossless-JPEG (ITU T.81 process 14, SOF3) ENCODER: the
fixture huffman-codes DPCM differences exactly per the spec (uniform 5-bit
canonical codes over the 17 ssss classes, byte stuffing, psv=1 predictor
with the T.81 first-row/first-column rules), so the C++ decoder is
validated against the format — a decode of the encoded stream must
reproduce the input mosaic bit-exactly (lossless).

CR2 container layout (lclevy's public CR2 format documentation): the raw
IFD carries Compression=6, the strip, and slice tag 0xC640 = [n, w1, w2];
the JPEG raster order is slice-major (vertical bands).  Canon maker-note
SensorInfo (0x00E0) provides the visible-area borders; the columns left of
SensorLeftBorder are optically black and define the per-channel black
level.
"""

import struct

import numpy as onp

from tests.tiff_fixture import TiffBuilder, T_SHORT, T_LONG, T_RATIONAL

T_UNDEF = 7


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
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def encode_lossless_jpeg(samples, precision=14):
    """samples: (h, w, ncomp) uint16 -> SOF3 JPEG bytes (psv=1)."""
    h, w, nc = samples.shape
    s = samples.astype(onp.int64)

    # DHT: one table, all 17 ssss classes at code length 5 (canonical)
    counts = [0] * 17
    counts[5] = 17
    dht_payload = bytes([0x00] + counts[1:] + list(range(17)))
    codes = {v: (v, 5) for v in range(17)}  # canonical: code == index

    bw = BitWriter()
    for row in range(h):
        for col in range(w):
            for c in range(nc):
                if col == 0:
                    pred = (1 << (precision - 1)) if row == 0 else s[row - 1, 0, c]
                else:
                    pred = s[row, col - 1, c]
                diff = int(s[row, col, c] - pred)
                ssss = 0 if diff == 0 else max(diff, -diff).bit_length()
                assert ssss <= 15, "fixture keeps diffs under the ssss=16 case"
                code, nbits = codes[ssss]
                bw.put(code, nbits)
                if ssss:
                    bw.put(diff if diff >= 0 else diff + (1 << ssss) - 1, ssss)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht_payload)) + dht_payload
    sof = bytes([precision]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([1, 0, 0])  # Ss=1 (predictor), Se, AhAl
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def make_cr2(rng, visible=(8, 32), borders=(4, 2), slices=(2, 16),
             ncomp=2, iso=1600, exposure=0.02, black=2048,
             precision=14) -> (bytes, onp.ndarray, onp.ndarray):
    """Full minimal .CR2 bytes + expected VISIBLE mosaic + full mosaic.

    visible: (height, width) of the visible area; borders: (left, top)
    masked margins (the right/bottom margins are 0 here).  slices:
    (n, w1) -> tag [n, w1, FW - n*w1].  The left `left` columns are
    optically black around `black`.
    """
    vh, vw = visible
    left, top = borders
    FH, FW = vh + top, vw + left
    n_sl, w1 = slices
    w2 = FW - n_sl * w1
    assert w2 > 0

    mosaic = rng.integers(black, 1 << precision, (FH, FW)).astype(onp.uint16)
    # optically black left border: black +- small noise
    mosaic[:, :left] = black + rng.integers(-8, 9, (FH, left))

    # slice-major sample stream -> JPEG frame raster
    bands = [mosaic[:, x0:x0 + wsl] for x0, wsl in zip(
        [i * w1 for i in range(n_sl)] + [n_sl * w1],
        [w1] * n_sl + [w2])]
    flat = onp.concatenate([b.reshape(-1) for b in bands])
    total = FH * FW
    # any (h_j, w_j) with h_j*w_j*ncomp == total works; pick a divisor
    assert total % ncomp == 0
    w_j = next(w for w in range(FW // ncomp, 0, -1)
               if (total // ncomp) % w == 0)
    h_j = total // (w_j * ncomp)
    assert h_j * w_j * ncomp == total
    jpeg = encode_lossless_jpeg(flat.reshape(h_j, w_j, ncomp), precision)

    b = TiffBuilder()
    strip_off = b.put(jpeg)

    # Canon maker note: SensorInfo borders (inclusive)
    sens = [17, FW, FH, 0, 0, left, top, left + vw - 1, top + vh - 1] + [0] * 8
    sens_off = b.put(b"".join(struct.pack("<H", v) for v in sens))
    mk_off = b.ifd([(0x00E0, T_SHORT, 17, struct.pack("<I", sens_off))])

    expo_off = b.put(struct.pack("<II", int(exposure * 100_000), 100_000))
    exif_off = b.ifd([
        (0x8827, T_SHORT, 1, struct.pack("<H", iso)),
        (0x829A, T_RATIONAL, 1, struct.pack("<I", expo_off)),
        (0x927C, T_UNDEF, 64, struct.pack("<I", mk_off)),
    ])

    slice_off = b.put(struct.pack("<HHH", n_sl, w1, w2))
    raw_ifd = b.ifd([
        (0x0103, T_SHORT, 1, struct.pack("<H", 6)),   # old-style JPEG
        (0x0111, T_LONG, 1, struct.pack("<I", strip_off)),
        (0x0117, T_LONG, 1, struct.pack("<I", len(jpeg))),
        (0xC640, T_SHORT, 3, struct.pack("<I", slice_off)),
    ])

    ifd0 = b.ifd([
        (0x00FE, T_LONG, 1, struct.pack("<I", 1)),
        (0x8769, T_LONG, 1, struct.pack("<I", exif_off)),
    ], next_off=raw_ifd)
    b.patch_u32(4, ifd0)

    visible_mosaic = mosaic[top:top + vh, left:left + vw].copy()
    return bytes(b.buf), visible_mosaic, mosaic
