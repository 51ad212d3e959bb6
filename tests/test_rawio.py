"""Native rawio parser tests against synthesized DNG-style TIFFs."""

import numpy as onp
import pytest

from eld_tpu.data import rawio
from tests.tiff_fixture import make_dng


@pytest.fixture
def dng_file(tmp_path, rng):
    mosaic = rng.integers(512, 16384, (32, 48)).astype(onp.uint16)
    path = tmp_path / "test.dng"
    path.write_bytes(make_dng(mosaic, iso=1600, exposure=0.1))
    return str(path), mosaic


def test_native_lib_loaded():
    assert rawio._LIB is not None, "librawio.so should be built (make -C native)"


def test_parse_mosaic(dng_file):
    path, mosaic = dng_file
    raw = rawio.imread(path)
    onp.testing.assert_array_equal(raw.mosaic, mosaic)
    assert raw.mosaic.shape == (32, 48)


def test_parse_metadata(dng_file):
    path, _ = dng_file
    raw = rawio.imread(path)
    assert raw.iso == 1600
    assert raw.exposure == pytest.approx(0.1, rel=1e-4)
    assert raw.white_level == 16383
    onp.testing.assert_allclose(raw.black_level, [512] * 4)
    onp.testing.assert_array_equal(raw.cfa_pattern, [[0, 1], [1, 2]])
    # AsShotNeutral (0.5, 1, 0.6) -> wb gains (2, 1, 1/0.6, 1)
    onp.testing.assert_allclose(raw.wb, [2.0, 1.0, 1 / 0.6, 1.0], rtol=1e-3)


def test_packed_normalization(dng_file):
    path, mosaic = dng_file
    raw = rawio.imread(path)
    packed = raw.packed()
    assert packed.shape == (16, 24, 4)
    # channel 0 = R at offset (0,0); verify normalization math
    want = onp.clip((mosaic[0::2, 0::2].astype(onp.float32) - 512) / (16383 - 512), 0, 1)
    onp.testing.assert_allclose(packed[..., 0], want, rtol=1e-6)


def test_metainfo(dng_file):
    path, _ = dng_file
    iso, expo = rawio.metainfo(path)
    assert iso == 1600 and expo == pytest.approx(0.1, rel=1e-4)


def test_grbg_pattern_offsets(tmp_path, rng):
    mosaic = rng.integers(0, 16384, (16, 16)).astype(onp.uint16)
    path = tmp_path / "grbg.dng"
    path.write_bytes(make_dng(mosaic, cfa=(1, 0, 2, 1)))  # GRBG
    raw = rawio.imread(str(path))
    offs = raw.pattern_offsets()
    assert offs[0] == (0, 1)  # R
    assert offs[2] == (1, 0)  # B
    packed = raw.packed()
    want_r = onp.clip((mosaic[0::2, 1::2].astype(onp.float32) - 512) / (16383 - 512), 0, 1)
    onp.testing.assert_allclose(packed[..., 0], want_r, rtol=1e-6)


def test_rawpack_roundtrip(tmp_path, dng_file):
    path, _ = dng_file
    raw = rawio.imread(path)
    pk = tmp_path / "x.npz"
    rawio.save_rawpack(str(pk), raw)
    back = rawio.imread(str(pk))
    onp.testing.assert_array_equal(back.mosaic, raw.mosaic)
    onp.testing.assert_allclose(back.wb, raw.wb)
    assert back.iso == raw.iso


def test_unparseable_file(tmp_path):
    bad = tmp_path / "bad.dng"
    bad.write_bytes(b"not a tiff at all, definitely not")
    with pytest.raises(rawio.UnsupportedRawError):
        rawio.imread(str(bad))


def test_parser_robust_to_garbage(tmp_path, rng):
    """The native parser must reject corrupt input cleanly, never crash."""
    cases = {
        "random": rng.integers(0, 256, 4096).astype(onp.uint8).tobytes(),
        "tiny": b"II*\x00",
        "bad_ifd_offset": b"II*\x00" + (0xFFFFFFFF).to_bytes(4, "little") + b"\x00" * 64,
        "empty": b"",
    }
    for name, payload in cases.items():
        p = tmp_path / f"{name}.dng"
        p.write_bytes(payload)
        with pytest.raises((rawio.UnsupportedRawError, FileNotFoundError)):
            rawio.imread(str(p))


def test_parser_truncated_strip(tmp_path, rng):
    """Strip offsets beyond EOF are rejected, not read out of bounds."""
    mosaic = rng.integers(0, 16384, (16, 16)).astype(onp.uint16)
    data = bytearray(make_dng(mosaic))
    truncated = bytes(data[: len(data) - mosaic.nbytes // 2])
    p = tmp_path / "trunc.dng"
    p.write_bytes(truncated)
    with pytest.raises(rawio.UnsupportedRawError):
        rawio.imread(str(p))


def test_parser_ifd_cycle(tmp_path):
    """A self-referencing IFD chain terminates (guard counter)."""
    import struct

    buf = bytearray(b"II*\x00")
    buf += struct.pack("<I", 8)          # IFD0 at offset 8
    buf += struct.pack("<H", 0)          # 0 entries
    buf += struct.pack("<I", 8)          # next IFD -> itself (cycle)
    p = tmp_path / "cycle.dng"
    p.write_bytes(bytes(buf))
    with pytest.raises(rawio.UnsupportedRawError):
        rawio.imread(str(p))


def test_compressed_decoders_survive_corruption(tmp_path, rng):
    """Truncation and random byte flips anywhere in ARW2/CR2/NEF files must
    yield either a clean decode (garbage VALUES are fine for flipped entropy
    bits) or UnsupportedRawError — never an out-of-bounds access (a segfault
    here would kill the test process) and never a hang."""
    from tests.arw_fixture import make_arw
    from tests.cr2_fixture import make_cr2
    from tests.nef_fixture import make_nef

    fixtures = {
        "a.ARW": make_arw(rng, width=64, height=8)[0],
        "c.CR2": make_cr2(rng, visible=(8, 32), borders=(4, 2),
                          slices=(2, 16), ncomp=2)[0],
        "n.nef": make_nef(rng, size=(8, 32))[0],
    }
    for name, data in fixtures.items():
        n = len(data)
        cases = []
        for cut in (1, n // 4, n // 2, n - 3):  # truncations
            cases.append(data[:cut])
        for _ in range(12):  # random byte flips (metadata AND entropy data)
            buf = bytearray(data)
            for pos in rng.integers(0, n, 3):
                buf[pos] ^= int(rng.integers(1, 256))
            cases.append(bytes(buf))
        for i, payload in enumerate(cases):
            p = tmp_path / f"{i}_{name}"
            p.write_bytes(payload)
            try:
                raw = rawio.imread(str(p))
                assert raw.mosaic.shape[0] > 0  # decoded: shape sane
            except (rawio.UnsupportedRawError, MemoryError,
                    OverflowError, ValueError):
                pass  # clean rejection is fine; anything else is a bug


def test_targeted_decoder_corruptions(tmp_path, rng):
    """Crafted corruptions hitting specific once-reachable UB/OOB classes
    in the lossless-JPEG path: DHT tables whose counts sum past 256 (would
    overread LjHuff::vals), SOF3 precision outside T.81's [2,16] (would
    shift by a negative exponent), and DHT value bytes > 16 decoded as
    ssss (would shift by up to 255).  Each must reject or decode cleanly."""
    from tests.cr2_fixture import make_cr2

    data = bytes(make_cr2(rng, visible=(8, 32), borders=(4, 2),
                          slices=(2, 16), ncomp=2)[0])

    def find_marker(buf, marker):
        i = buf.find(bytes([0xFF, marker]))
        assert i >= 0, f"fixture lacks marker {marker:02x}"
        return i

    # (a) DHT counts sum > 256: set the 16-codes-of-len-16 count to 0xFF
    dht = find_marker(data, 0xC4)
    buf = bytearray(data)
    buf[dht + 4 + 1 + 15] = 0xFF  # counts[16]
    # also grow the declared segment length so nv <= seglen still holds
    seglen = (buf[dht + 2] << 8) | buf[dht + 3]
    buf[dht + 2:dht + 4] = (seglen + 300).to_bytes(2, "big")
    cases = [bytes(buf)]

    # (b) SOF3 precision 0 and 17
    sof = find_marker(data, 0xC3)
    for prec in (0, 17, 255):
        buf = bytearray(data)
        buf[sof + 4] = prec
        cases.append(bytes(buf))

    # (c) a DHT value byte far above 16 (ssss class 0xEE)
    buf = bytearray(data)
    buf[dht + 4 + 17] = 0xEE  # first Huffman value
    cases.append(bytes(buf))

    # (d) SOS Td nibble 15: would index huff[4] out of bounds in lj_decode
    sos = find_marker(data, 0xDA)
    buf = bytearray(data)
    buf[sos + 6] = 0xF0  # first component's Td<<4|Ta byte
    cases.append(bytes(buf))

    for i, payload in enumerate(cases):
        p = tmp_path / f"t{i}.CR2"
        p.write_bytes(payload)
        try:
            raw = rawio.imread(str(p))
            assert raw.mosaic.shape[0] > 0
        except (rawio.UnsupportedRawError, ValueError):
            pass


def test_ccm_conversion_roundtrip(rng):
    """ColorMatrix (XYZ->cam) -> cam->sRGB inverts the dcraw recipe and
    preserves white (cam [1,1,1] -> sRGB [1,1,1])."""
    from eld_tpu.data.rawio import _XYZ_FROM_SRGB, ccm_from_colormatrix

    cam_from_srgb = rng.random((3, 3)) + 0.1
    cam_from_srgb /= cam_from_srgb.sum(axis=1, keepdims=True)  # rows sum 1
    cm = cam_from_srgb @ onp.linalg.inv(_XYZ_FROM_SRGB)
    ccm = ccm_from_colormatrix(cm)
    onp.testing.assert_allclose(ccm, onp.linalg.inv(cam_from_srgb), rtol=1e-4)
    onp.testing.assert_allclose(ccm @ onp.ones(3), onp.ones(3), atol=1e-4)


def test_black_level_cell_to_channel_reorder(tmp_path, rng):
    """DNG BlackLevel is cell-order; RawFile.black_level must be packed
    channel order (R,G1,B,G2) — regression for the B/G2 swap."""
    mosaic = rng.integers(1024, 16384, (16, 16)).astype(onp.uint16)
    # RGGB: cells (0,0)=R (0,1)=G1 (1,0)=G2* (1,1)=B -> with pattern codes
    # (0,1,1,2) greens are disambiguated by order: G1=(0,1), G2=(1,0)
    p = tmp_path / "bl.dng"
    p.write_bytes(make_dng(mosaic, black=(100, 200, 300, 400), cfa=(0, 1, 1, 2)))
    raw = rawio.imread(str(p))
    # cells row-major: R=100, G1=200, G2=300, B=400
    onp.testing.assert_allclose(raw.black_level, [100, 200, 400, 300])
    # packed() must subtract the right black per channel
    packed = raw.packed()
    want_b = onp.clip((mosaic[1::2, 1::2].astype(onp.float32) - 400) / (16383 - 400), 0, 1)
    onp.testing.assert_allclose(packed[..., 2], want_b, rtol=1e-6)


def test_missing_black_level_rejected(tmp_path, rng):
    """No DNG BlackLevel tag -> clear error, not silent black=0."""
    import struct

    from tests.tiff_fixture import TiffBuilder, T_LONG, T_SHORT, long_, short

    mosaic = rng.integers(0, 16384, (8, 8)).astype(onp.uint16)
    b = TiffBuilder()
    strip = b.put(mosaic.astype("<u2").tobytes())
    ifd0 = b.ifd([
        (0x0100, T_LONG, 1, long_(8)),
        (0x0101, T_LONG, 1, long_(8)),
        (0x0102, T_SHORT, 1, short(16)),
        (0x0103, T_SHORT, 1, short(1)),
        (0x0106, T_SHORT, 1, short(32803)),
        (0x0111, T_LONG, 1, long_(strip)),
        (0x0117, T_LONG, 1, long_(mosaic.nbytes)),
    ])
    b.patch_u32(4, ifd0)
    p = tmp_path / "nolevels.dng"
    p.write_bytes(bytes(b.buf))
    with pytest.raises(rawio.UnsupportedRawError, match="black-level"):
        rawio.imread(str(p))


# ---------------------------------------------------------------------------
# Sony ARW 2.3 (the actual SID dataset format)
# ---------------------------------------------------------------------------


def test_arw2_roundtrip(tmp_path, rng):
    """Native ARW2 decode == the independent Python twin of the format spec
    (encoder fixture): mosaic, tone curve, black/WB/white/EXIF metadata."""
    from tests.arw_fixture import make_arw

    data, expected = make_arw(rng, width=64, height=8, iso=800, exposure=0.04)
    path = tmp_path / "fixture.ARW"
    path.write_bytes(data)
    raw = rawio.imread(str(path))
    onp.testing.assert_array_equal(raw.mosaic, expected)
    assert raw.mosaic.shape == (8, 64)
    # maker-note metadata: black given in packed (R,G1,B,G2) order
    onp.testing.assert_array_equal(raw.black_level, [512, 513, 515, 514])
    assert raw.white_level == 16383
    onp.testing.assert_array_equal(raw.wb, [2048, 1024, 1560, 1024])
    assert raw.iso == 800
    assert raw.exposure == pytest.approx(0.04)
    onp.testing.assert_array_equal(raw.cfa_pattern, [[0, 1], [1, 2]])


def test_arw2_curve_expansion_is_applied(tmp_path, rng):
    """Two files with identical bitstreams but different curve knots decode
    to different values — proving the data-driven tone curve is in effect."""
    from tests.arw_fixture import make_arw

    rng_state = rng.bit_generator.state
    a, exp_a = make_arw(rng, knots=(1000, 2000, 3000, 3600))
    rng.bit_generator.state = rng_state
    b, exp_b = make_arw(rng, knots=(200, 400, 800, 1600))
    assert not onp.array_equal(exp_a, exp_b)
    for name, data, expected in (("a.ARW", a, exp_a), ("b.ARW", b, exp_b)):
        p = tmp_path / name
        p.write_bytes(data)
        onp.testing.assert_array_equal(rawio.imread(str(p)).mosaic, expected)


def test_arw2_missing_curve_warns(tmp_path, rng):
    from tests.arw_fixture import make_arw

    data, expected = make_arw(rng, with_curve_tag=False)
    path = tmp_path / "nocurve.ARW"
    path.write_bytes(data)
    with pytest.warns(UserWarning, match="tone-curve"):
        raw = rawio.imread(str(path))
    onp.testing.assert_array_equal(raw.mosaic, expected)


def test_arw2_missing_black_defaults_512(tmp_path, rng):
    from tests.arw_fixture import make_arw

    data, _ = make_arw(rng, with_black_tag=False)
    path = tmp_path / "noblack.ARW"
    path.write_bytes(data)
    with pytest.warns(UserWarning, match="black"):
        raw = rawio.imread(str(path))
    onp.testing.assert_array_equal(raw.black_level, [512, 512, 512, 512])


def test_arw2_packed_pipeline(tmp_path, rng):
    """End-to-end: ARW fixture -> imread -> packed() in [0,1] with the SID
    normalization ((x - black)/(white - black), sid_dataset.py:181-194)."""
    from tests.arw_fixture import make_arw

    data, expected = make_arw(rng, width=64, height=8)
    path = tmp_path / "pack.ARW"
    path.write_bytes(data)
    raw = rawio.imread(str(path))
    packed = raw.packed()
    assert packed.shape == (4, 32, 4)
    assert packed.min() >= 0.0 and packed.max() <= 1.0
    want_r = onp.clip((expected[0::2, 0::2].astype(onp.float32) - 512)
                      / (16383 - 512), 0, 1)
    onp.testing.assert_allclose(packed[..., 0], want_r, atol=1e-6)


# ---------------------------------------------------------------------------
# X-Trans (6x6 CFA) native ingest
# ---------------------------------------------------------------------------

# the Fuji X-Trans 6x6 layout, consistent with the reference's 9-channel
# sampling map (noise.py:31-63 / core/packing.py)
XTRANS_CFA = (0, 2, 1, 2, 0, 1,
              1, 1, 0, 1, 1, 2,
              1, 1, 2, 1, 1, 0,
              2, 0, 1, 0, 2, 1,
              1, 1, 2, 1, 1, 0,
              1, 1, 0, 1, 1, 2)


def test_xtrans_native_ingest(tmp_path, rng):
    """A 6x6-CFA TIFF decodes to RawFile(cfa='xtrans') and packs into the
    reference's 9-plane layout (VERDICT round-1 item 8)."""
    from tests.tiff_fixture import make_dng
    from eld_tpu.core.packing import pack_xtrans

    mosaic = rng.integers(1024, 16384, (36, 48)).astype(onp.uint16)
    p = tmp_path / "fuji.dng"
    p.write_bytes(make_dng(mosaic, black=(1024,) * 4, white=16383,
                           cfa=XTRANS_CFA))
    raw = rawio.imread(str(p))
    assert raw.cfa == "xtrans"
    assert raw.cfa_pattern.shape == (6, 6)
    onp.testing.assert_array_equal(raw.cfa_pattern.ravel(), XTRANS_CFA)
    packed = raw.packed()
    assert packed.shape == (12, 16, 9)
    want = pack_xtrans(onp.clip(
        (mosaic.astype(onp.float32) - 1024) / (16383 - 1024), 0, 1))
    onp.testing.assert_allclose(packed, want, atol=1e-6)


def test_xtrans_phase_mismatch_raises(rng):
    """packed() refuses a 6x6 CFA whose phase differs from the canonical
    X-Trans layout instead of silently mispacking color planes."""
    from eld_tpu.core.packing import xtrans_pattern

    shifted = onp.roll(xtrans_pattern(), 1, axis=1)  # col-shifted phase
    raw = rawio.RawFile(
        mosaic=rng.integers(1024, 16384, (36, 48)).astype(onp.uint16),
        black_level=onp.full(4, 1024.0, onp.float32),
        white_level=16383.0,
        cfa_pattern=shifted,
        wb=onp.ones(4, onp.float32),
        ccm=onp.eye(3, dtype=onp.float32),
        iso=100.0, exposure=1.0, cfa="xtrans")
    with pytest.raises(rawio.UnsupportedRawError, match="phase"):
        raw.packed()


def test_xtrans_sid_dataset(tmp_path, rng):
    """SIDDataset(cfa='xtrans') end-to-end from native-decoded fixtures
    (reference Fuji path, sid_dataset.py:199-245)."""
    from tests.tiff_fixture import make_dng
    from eld_tpu.data.datasets import SIDDataset

    (tmp_path / "short").mkdir()
    (tmp_path / "long").mkdir()
    gt = rng.integers(2048, 16384, (36, 48)).astype(onp.uint16)
    dark = (1024 + (gt.astype(onp.float32) - 1024) / 100).astype(onp.uint16)
    (tmp_path / "long" / "0_00_10s.dng").write_bytes(
        make_dng(gt, black=(1024,) * 4, cfa=XTRANS_CFA, iso=100, exposure=10))
    (tmp_path / "short" / "0_00_0.1s.dng").write_bytes(
        make_dng(dark, black=(1024,) * 4, cfa=XTRANS_CFA, iso=100, exposure=0.1))
    ds = SIDDataset(str(tmp_path), [("0_00_0.1s.dng", "0_00_10s.dng")],
                    cfa="xtrans", augment=False, memorize=False)
    item = ds[0]
    assert item["input"].shape == (12, 16, 9)
    assert item["target"].shape == (12, 16, 9)
    # ratio x100 roughly cancels the /100 darkening
    assert onp.abs(item["input"] - item["target"]).mean() < 0.03


# ---------------------------------------------------------------------------
# Canon CR2 (lossless JPEG + slices + masked borders)
# ---------------------------------------------------------------------------


def test_cr2_roundtrip(tmp_path, rng):
    """Native CR2 decode reproduces the fixture mosaic BIT-EXACTLY (the
    compression is lossless), crops to the SensorInfo visible area, and
    derives per-channel black from the masked left border."""
    from tests.cr2_fixture import make_cr2

    data, visible, full = make_cr2(rng, visible=(8, 32), borders=(4, 2),
                                   slices=(2, 16), ncomp=2, black=2048)
    p = tmp_path / "fixture.CR2"
    p.write_bytes(data)
    raw = rawio.imread(str(p))
    onp.testing.assert_array_equal(raw.mosaic, visible)
    assert raw.white_level == 16383
    assert raw.iso == 1600 and raw.exposure == pytest.approx(0.02)
    onp.testing.assert_array_equal(raw.cfa_pattern, [[0, 1], [1, 2]])
    # black ~ 2048 per channel (mask average)
    onp.testing.assert_allclose(raw.black_level, [2048] * 4, atol=8)


def test_cr2_unsliced_and_multislice(tmp_path, rng):
    from tests.cr2_fixture import make_cr2

    for name, slices, ncomp in (("one.CR2", (1, 24), 4), ("tri.CR2", (3, 8), 2)):
        data, visible, _ = make_cr2(rng, visible=(4, 32), borders=(4, 4),
                                    slices=slices, ncomp=ncomp)
        p = tmp_path / name
        p.write_bytes(data)
        onp.testing.assert_array_equal(rawio.imread(str(p)).mosaic, visible)


def test_cr2_odd_borders_shift_cfa(tmp_path, rng):
    """Odd SensorInfo margins shift the visible CFA phase off the sensor's
    RGGB origin."""
    from tests.cr2_fixture import make_cr2

    data, visible, _ = make_cr2(rng, visible=(8, 26), borders=(5, 3),
                                slices=(1, 16), ncomp=1)
    p = tmp_path / "odd.CR2"
    p.write_bytes(data)
    raw = rawio.imread(str(p))
    onp.testing.assert_array_equal(raw.mosaic, visible)
    # top odd, left odd: visible (0,0) sits at sensor (odd, odd) = B
    onp.testing.assert_array_equal(raw.cfa_pattern, [[2, 1], [1, 0]])
    packed = raw.packed()
    assert packed.shape == (4, 13, 4)


def test_cr2_eld_eval_dataset(tmp_path, rng):
    """ELDEvalDataset walks native-decoded .CR2 scenes end-to-end
    (reference: dataset/sid_dataset.py:370-419, Canon ELD cameras)."""
    from tests.cr2_fixture import make_cr2
    from eld_tpu.data.datasets import ELDEvalDataset

    scene = tmp_path / "CanonEOS70D" / "scene-1"
    scene.mkdir(parents=True)
    # GT for input id 4 is the nearest of {1,6,11,16} -> 6
    for img_id, iso, expo in ((6, 100, 1.0), (4, 800, 0.01)):
        data, _, _ = make_cr2(rng, visible=(8, 32), borders=(4, 2),
                              iso=iso, exposure=expo)
        (scene / f"IMG_{img_id:04d}.CR2").write_bytes(data)
    ds = ELDEvalDataset(str(tmp_path), ("CanonEOS70D", ".CR2"),
                        scenes=[1], img_ids=[4])
    item = ds[0]
    assert item["input"].shape == (4, 16, 4)
    assert item["target"].shape == (4, 16, 4)
    # ratio = (iso*expo)_gt / (iso*expo)_in = 100 / 8 = 12.5
    assert item["ratio"] == pytest.approx(12.5)


# ---------------------------------------------------------------------------
# Nikon NEF (lossless huffman DPCM — the ELD D850 format)
# ---------------------------------------------------------------------------


def test_nef_roundtrip(tmp_path, rng):
    """Native NEF decode reproduces the fixture mosaic BIT-EXACTLY
    (lossless), with maker-note black level and standard EXIF."""
    from tests.nef_fixture import make_nef

    for bits in (14, 12):
        vp = (8192, 8200, 8100, 8300) if bits == 14 else (2048, 2050, 2040, 2060)
        data, mosaic = make_nef(rng, size=(8, 32), bits=bits, vpred=vp)
        p = tmp_path / f"fixture{bits}.nef"
        p.write_bytes(data)
        raw = rawio.imread(str(p))
        onp.testing.assert_array_equal(raw.mosaic, mosaic)
        assert raw.white_level == (1 << bits) - 1
        # tag order (R,G1,G2,B) cells -> packed (R,G1,B,G2)
        onp.testing.assert_array_equal(raw.black_level, [400, 401, 403, 402])
    assert raw.iso == 640 and raw.exposure == pytest.approx(0.05)


def test_nef_lossy_rejected(tmp_path, rng):
    """Lossy NEF variants (version byte != 0x46) report a clear error."""
    from tests.nef_fixture import make_nef

    data, _ = make_nef(rng, ver=(0x44, 0x20))
    p = tmp_path / "lossy.nef"
    p.write_bytes(data)
    with pytest.raises(rawio.UnsupportedRawError):
        rawio.imread(str(p))


def test_nef_missing_black_defaults_400(tmp_path, rng):
    from tests.nef_fixture import make_nef, make_nikon_makernote

    data, mosaic = make_nef(rng)
    # rebuild the maker note without the 0x3D black tag by zeroing its tag id
    import struct

    idx = data.find(b"Nikon\x00")
    assert idx > 0
    mut = bytearray(data)
    tag_at = data.find(struct.pack("<HH", 0x003D, 3), idx)
    assert tag_at > 0
    mut[tag_at:tag_at + 2] = b"\xff\xfe"  # unknown tag
    p = tmp_path / "noblack.nef"
    p.write_bytes(bytes(mut))
    with pytest.warns(UserWarning, match="black"):
        raw = rawio.imread(str(p))
    onp.testing.assert_array_equal(raw.black_level, [400] * 4)
    onp.testing.assert_array_equal(raw.mosaic, mosaic)


def test_nef_eld_eval_dataset(tmp_path, rng):
    """ELDEvalDataset over native-decoded .nef scenes (NikonD850 path)."""
    from tests.nef_fixture import make_nef
    from eld_tpu.data.datasets import ELDEvalDataset

    scene = tmp_path / "NikonD850" / "scene-1"
    scene.mkdir(parents=True)
    for img_id, iso, expo in ((6, 100, 1.0), (4, 800, 0.01)):
        data, _ = make_nef(rng, size=(8, 32), iso=iso, exposure=expo)
        (scene / f"IMG_{img_id:04d}.nef").write_bytes(data)
    ds = ELDEvalDataset(str(tmp_path), ("NikonD850", ".nef"),
                        scenes=[1], img_ids=[4])
    item = ds[0]
    assert item["input"].shape == (4, 16, 4)
    assert item["ratio"] == pytest.approx(12.5)


def test_degenerate_levels_rejected(rng):
    """white <= black (possible from corrupt-but-parseable metadata) must
    raise instead of clipping sign-flipped garbage into [0,1]."""
    import pytest

    raw = rawio.RawFile(
        mosaic=onp.full((4, 4), 600, onp.uint16),
        black_level=onp.full(4, 512.0, onp.float32),
        white_level=512.0,  # == black
        cfa_pattern=onp.array([[0, 1], [3, 2]], onp.uint8),
        wb=onp.ones(4, onp.float32), ccm=onp.eye(3, dtype=onp.float32),
        iso=100.0, exposure=0.1)
    with pytest.raises(rawio.UnsupportedRawError, match="white level"):
        raw.packed()
    raw.white_level = 300.0  # < black
    with pytest.raises(rawio.UnsupportedRawError):
        raw.packed()
    raw.white_level = 16383.0
    assert raw.packed().shape == (2, 2, 4)
