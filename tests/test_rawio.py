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
