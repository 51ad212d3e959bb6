"""Differential visible-area / CFA-phase / black-level semantics tests
for the native decoders (VERDICT r3 #4).

The round-trip fixtures (tests/test_rawio.py) share the builder's
understanding of each format — an off-by-one in visible-area cropping or
CFA-phase handling could cancel between encoder and decoder.  These
tests break that circularity at the semantic layer: the SAME synthesized
container flows through

  (a) ``rawio.imread(path).packed()`` — our parser + packer, and
  (b) the REFERENCE'S OWN ``pack_raw_bayer`` / ``pack_raw_xtrans``
      (``/root/reference/dataset/sid_dataset.py:172-245``), fed by a
      rawpy-stub built from the fixture's ground-truth SIDECAR (the
      pre-container mosaic and geometry) — never from our parser,

at adversarial geometries: nonzero odd visible-area origins, distinct
per-channel black levels, all four Bayer phases, saturated/zeroed masked
borders, and 6x6 X-Trans phase shifts.  A plane swap, level shift, or
crop off-by-one shows up as a packed-tensor mismatch here that the
round-trip tests cannot catch.

Green-channel naming: a DNG that codes both greens as 1 cannot say which
is rawpy's G1 (code 1) vs G2 (code 3); both sides of the diff use the
same convention — first green in CFA-cell row-major order is G1.
"""

import importlib.util
import os
import sys
import types

import numpy as onp
import pytest

from eld_tpu.data import rawio
from tests.tiff_fixture import make_dng

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module")
def ref_pack():
    """Load the reference's sid_dataset.py with its heavy imports stubbed
    (rawpy/exifread/torch-dataset plumbing are unused by the pack fns)."""
    torch = pytest.importorskip("torch")  # noqa: F841  (module import needs it)
    stubs = {}

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        stubs[name] = sys.modules.get(name)
        sys.modules[name] = mod
        return mod

    stub("rawpy")
    stub("exifread", process_file=lambda *a, **k: {})
    stub("dataset")
    stub("dataset.torchdata", Dataset=object)
    stub("util")
    stub("util.process")
    stub("util.util", loadmat=lambda *a, **k: None)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_sid_dataset", os.path.join(REFERENCE, "dataset/sid_dataset.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for name, old in stubs.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old


class RawpyStub:
    """The attribute surface pack_raw_bayer consumes, built from sidecar
    ground truth (full mosaic + geometry), independent of our parser."""

    def __init__(self, full, window, pattern, black_per_channel):
        t, l, b, r = window
        self.raw_image_visible = onp.asarray(full)[t:b, l:r]
        self.raw_pattern = onp.asarray(pattern)
        self.black_level_per_channel = list(black_per_channel)


# (name, 2x2 cells row-major with both greens coded 1 — what the DNG
# stores; the rawpy-style stub recodes the SECOND green as 3)
PHASES = {
    "rggb": (0, 1, 1, 2),
    "grbg": (1, 0, 2, 1),
    "bggr": (2, 1, 1, 0),
    "gbrg": (1, 2, 0, 1),
}


def _rawpy_pattern(cells):
    """DNG 2x2 cells (greens=1) -> rawpy-style codes (second green=3)."""
    out = list(cells)
    out[max(i for i, c in enumerate(cells) if c == 1)] = 3
    return onp.asarray(out, onp.uint8).reshape(2, 2)


def _cell_blacks(cells, packed_blacks):
    """Packed-order (R,G1,B,G2) blacks -> CFA-cell row-major (the DNG
    BlackLevel tag layout)."""
    order = []
    seen_g = 0
    for c in cells:
        if c == 1:
            order.append(1 if seen_g == 0 else 3)
            seen_g += 1
        else:
            order.append({0: 0, 2: 2}[c])
    return tuple(packed_blacks[{0: 0, 1: 1, 2: 2, 3: 3}[i]] for i in order)


@pytest.mark.parametrize("phase", sorted(PHASES))
@pytest.mark.parametrize("origin", [(0, 0), (1, 1), (3, 5), (2, 7)])
def test_dng_active_area_differential(tmp_path, rng, ref_pack, phase, origin):
    """Uncompressed DNG with masked borders (ActiveArea tag): our decode+
    pack equals the reference's pack over the sidecar window, for every
    Bayer phase and odd/even crop origin, with distinct per-channel
    blacks.  Borders are filled with saturating garbage so any window
    off-by-one shifts the result detectably."""
    t, l = origin
    vh, vw = 36, 44
    full_h, full_w = vh + t + 3, vw + l + 5
    full = rng.integers(600, 16383, (full_h, full_w)).astype(onp.uint16)
    # adversarial masked borders: alternating 0 / white
    mask = onp.ones((full_h, full_w), bool)
    mask[t:t + vh, l:l + vw] = False
    garbage = onp.where((onp.indices((full_h, full_w)).sum(0) & 1).astype(bool),
                        16383, 0).astype(onp.uint16)
    full[mask] = garbage[mask]

    cells = PHASES[phase]
    packed_blacks = (500, 510, 520, 530)  # (R, G1, B, G2)
    blob = make_dng(full, black=_cell_blacks(cells, packed_blacks),
                    white=16383, cfa=cells,
                    active_area=(t, l, t + vh, l + vw))
    p = tmp_path / f"{phase}_{t}_{l}.dng"
    p.write_bytes(blob)

    raw = rawio.imread(str(p))
    assert raw.mosaic.shape == (vh, vw)
    onp.testing.assert_array_equal(raw.mosaic, full[t:t + vh, l:l + vw])
    onp.testing.assert_array_equal(raw.black_level, packed_blacks)

    stub = RawpyStub(full, (t, l, t + vh, l + vw),
                     _rawpy_pattern(cells), packed_blacks)
    want = ref_pack.pack_raw_bayer(stub)  # (4, vh/2, vw/2) CHW
    got = raw.packed()
    onp.testing.assert_allclose(got, onp.transpose(want, (1, 2, 0)),
                                rtol=0, atol=1e-6)


def test_dng_without_active_area_unchanged(tmp_path, rng, ref_pack):
    """No ActiveArea tag -> full-frame semantics stay exactly as before
    (regression guard on the new crop path)."""
    full = rng.integers(600, 16383, (24, 32)).astype(onp.uint16)
    p = tmp_path / "plain.dng"
    p.write_bytes(make_dng(full, black=(512,) * 4))
    raw = rawio.imread(str(p))
    onp.testing.assert_array_equal(raw.mosaic, full)
    stub = RawpyStub(full, (0, 0, 24, 32), [[0, 1], [3, 2]], [512] * 4)
    onp.testing.assert_allclose(
        raw.packed(), onp.transpose(ref_pack.pack_raw_bayer(stub), (1, 2, 0)),
        rtol=0, atol=1e-6)


def test_arw_differential_reference_pack(tmp_path, rng, ref_pack):
    """Sony ARW2: decoded mosaic through OUR packer equals the reference's
    pack_raw_bayer fed the fixture's expected-mosaic sidecar."""
    from tests.arw_fixture import make_arw

    blacks = (512.0, 513.0, 515.0, 514.0)  # packed (R,G1,B,G2), fixture default
    data, expected = make_arw(rng, width=64, height=16)
    p = tmp_path / "a.ARW"
    p.write_bytes(data)
    raw = rawio.imread(str(p))

    stub = RawpyStub(expected, (0, 0, 16, 64), [[0, 1], [3, 2]], blacks)
    want = ref_pack.pack_raw_bayer(stub)
    onp.testing.assert_allclose(raw.packed(), onp.transpose(want, (1, 2, 0)),
                                rtol=0, atol=1e-6)


def test_cr2_differential_reference_pack(tmp_path, rng, ref_pack):
    """Canon CR2 with ODD masked borders: our decode+pack equals the
    reference's pack over the sidecar's visible window, with the CFA
    phase derived independently from the border parity and the
    per-channel blacks measured independently from the sidecar's masked
    columns (LibRaw semantics: mean of the optically black border)."""
    from tests.cr2_fixture import make_cr2

    left, top = 5, 3
    vh, vw = 16, 32
    data, visible, full = make_cr2(rng, visible=(vh, vw), borders=(left, top),
                                   slices=(1, 16), ncomp=1, black=2048)
    p = tmp_path / "c.CR2"
    p.write_bytes(data)
    raw = rawio.imread(str(p))
    onp.testing.assert_array_equal(raw.mosaic, visible)

    # independent phase: Canon full-sensor origin is RGGB; shift by parity
    base = onp.array([[0, 1], [1, 2]])
    pat = onp.roll(onp.roll(base, -top % 2, 0), -left % 2, 1)
    pat_rawpy = _rawpy_pattern(tuple(pat.reshape(-1)))
    # independent per-channel black: mean of masked cols (skip 2 junk
    # cols next to the visible edge), per VISIBLE-phase cell
    blacks = onp.zeros(4)
    offs = {tuple(onp.argwhere(pat_rawpy == c)[0]): i
            for i, c in enumerate((0, 1, 2, 3))}
    sums = onp.zeros((2, 2))
    cnts = onp.zeros((2, 2))
    for row in range(top, top + vh):
        for col in range(0, left - 2):
            a, b = (row - top) & 1, (col & 1) ^ (left & 1)
            sums[a, b] += full[row, col]
            cnts[a, b] += 1
    for (a, b), ch in offs.items():
        blacks[ch] = sums[a, b] / cnts[a, b]
    onp.testing.assert_allclose(raw.black_level, blacks, rtol=0, atol=1e-9)

    stub = RawpyStub(full, (top, left, top + vh, left + vw), pat_rawpy, blacks)
    want = ref_pack.pack_raw_bayer(stub)
    onp.testing.assert_allclose(raw.packed(), onp.transpose(want, (1, 2, 0)),
                                rtol=0, atol=1e-6)


def test_nef_differential_reference_pack(tmp_path, rng, ref_pack):
    """Nikon NEF: maker-note blacks (cell order R,G1,G2,B) through our
    packer equal the reference pack with packed-order blacks."""
    from tests.nef_fixture import make_nef

    data, mosaic = make_nef(rng, size=(16, 32), black=(400, 401, 402, 403))
    p = tmp_path / "n.nef"
    p.write_bytes(data)
    raw = rawio.imread(str(p))
    # tag cells (R,G1,G2,B) -> packed (R,G1,B,G2)
    stub = RawpyStub(mosaic, (0, 0, 16, 32), [[0, 1], [3, 2]],
                     (400, 401, 403, 402))
    want = ref_pack.pack_raw_bayer(stub)
    onp.testing.assert_allclose(raw.packed(), onp.transpose(want, (1, 2, 0)),
                                rtol=0, atol=1e-6)


def test_xtrans_active_area_differential(tmp_path, rng, ref_pack):
    """X-Trans DNG behind an ActiveArea crop at a 6-aligned origin: our
    decode+pack equals the reference's pack_raw_xtrans on the sidecar
    window (reference normalization: hardcoded black 1024 / white 16383,
    sid_dataset.py:202)."""
    from eld_tpu.core.packing import xtrans_pattern

    t, l = 6, 12
    vh, vw = 36, 48
    full = rng.integers(1024, 16383, (vh + t + 2, vw + l + 4)).astype(onp.uint16)
    blob = make_dng(full, black=(1024,) * 4, white=16383,
                    cfa=tuple(int(c) for c in xtrans_pattern().reshape(-1)),
                    active_area=(t, l, t + vh, l + vw))
    p = tmp_path / "x.dng"
    p.write_bytes(blob)
    raw = rawio.imread(str(p))
    assert raw.cfa == "xtrans" and raw.mosaic.shape == (vh, vw)

    stub = types.SimpleNamespace(
        raw_image_visible=full[t:t + vh, l:l + vw])
    want = ref_pack.pack_raw_xtrans(stub)  # (9, vh/3, vw/3) CHW
    onp.testing.assert_allclose(raw.packed(), onp.transpose(want, (1, 2, 0)),
                                rtol=0, atol=1e-6)


def test_xtrans_active_area_bad_phase_refused(tmp_path, rng):
    """A 6x6 pattern rolled to a non-canonical phase behind an ActiveArea
    crop must be REFUSED at pack time (silent plane corruption guard),
    not packed wrong."""
    from eld_tpu.core.packing import xtrans_pattern

    rolled = onp.roll(onp.roll(xtrans_pattern(), 2, 0), 4, 1)
    full = rng.integers(1024, 16383, (40, 52)).astype(onp.uint16)
    blob = make_dng(full, black=(1024,) * 4, white=16383,
                    cfa=tuple(int(c) for c in rolled.reshape(-1)),
                    active_area=(2, 4, 38, 52))
    p = tmp_path / "xbad.dng"
    p.write_bytes(blob)
    raw = rawio.imread(str(p))
    with pytest.raises(rawio.UnsupportedRawError, match="phase"):
        raw.packed()
