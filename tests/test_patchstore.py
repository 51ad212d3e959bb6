"""PatchStore round-trip + native/fallback equivalence."""

import numpy as onp
import pytest

from eld_tpu.data.patchstore import PatchStore, PatchStoreWriter, _LIB


def make_store(tmp_path, n=6, shape=(16, 16, 4), dtype=onp.uint16, **aux_gen):
    path = str(tmp_path / "db.eps")
    rng = onp.random.default_rng(0)
    recs = []
    with PatchStoreWriter(path, shape, dtype=dtype) as w:
        for i in range(n):
            if dtype == onp.uint16:
                rec = rng.integers(0, 65536, shape).astype(dtype)
            else:
                rec = rng.random(shape).astype(dtype)
            recs.append(rec)
            w.append(rec, wb=onp.array([2.0, 1.0, 1.5, 1.0]), ccm=onp.eye(3))
    return path, recs


def test_native_lib_loaded():
    assert _LIB is not None, "libpatchstore.so should be built (make -C native)"


def test_roundtrip_uint16(tmp_path):
    path, recs = make_store(tmp_path)
    store = PatchStore(path)
    assert len(store) == 6
    assert store.shape == (16, 16, 4)
    for i, rec in enumerate(recs):
        onp.testing.assert_array_equal(store.record(i), rec)
        onp.testing.assert_allclose(store[i], rec.astype(onp.float32) / 65535, atol=1e-6)


def test_float_append_to_uint16_quantizes(tmp_path):
    """Float [0,1] records written to a uint16 store round-trip through the
    read side's /65535 normalization instead of truncating to zero."""
    path = str(tmp_path / "db.eps")
    rng = onp.random.default_rng(3)
    rec = rng.random((16, 16, 4), dtype=onp.float32)
    with PatchStoreWriter(path, (16, 16, 4), dtype=onp.uint16) as w:
        w.append(rec)
    store = PatchStore(path)
    onp.testing.assert_allclose(store[0], rec, atol=0.5 / 65535)


def test_roundtrip_float32(tmp_path):
    path, recs = make_store(tmp_path, dtype=onp.float32)
    store = PatchStore(path)
    for i, rec in enumerate(recs):
        onp.testing.assert_array_equal(store[i], rec)


def test_native_equals_fallback(tmp_path):
    path, _ = make_store(tmp_path)
    a = PatchStore(path, use_native=True)
    b = PatchStore(path, use_native=False)
    assert a.native and not b.native
    for i in range(len(a)):
        onp.testing.assert_array_equal(a[i], b[i])


def test_batch_fetch(tmp_path):
    path, recs = make_store(tmp_path)
    store = PatchStore(path)
    got = store.batch([0, 3, 5, 1])
    want = onp.stack([store[i] for i in (0, 3, 5, 1)])
    onp.testing.assert_array_equal(got, want)


def test_aux_metadata(tmp_path):
    path, _ = make_store(tmp_path)
    store = PatchStore(path)
    assert store.meta["wb"].shape == (6, 4)
    assert store.meta["ccm"].shape == (6, 3, 3)


def test_size_repeat_virtualization(tmp_path):
    path, recs = make_store(tmp_path)
    store = PatchStore(path, size=3, repeat=4)
    assert len(store) == 12
    onp.testing.assert_array_equal(store[4].astype(onp.float32), store[1])


def test_missing_store():
    with pytest.raises(FileNotFoundError):
        PatchStore("/nonexistent/db.eps")


def test_corrupt_header_rejected(tmp_path):
    """Corrupted/truncated data.bin must raise a clean ValueError in both
    the native and NumPy readers — never hand garbage geometry to mmap
    (native previously trusted ndim/count and could read past dims[8] or
    SIGBUS past the mapped file)."""
    import pytest

    from eld_tpu.data.patchstore import PatchStore, PatchStoreWriter

    base = tmp_path / "db"
    with PatchStoreWriter(str(base), (4, 6, 2)) as w:
        for i in range(3):
            w.append(onp.full((4, 6, 2), i, onp.uint16))
    bin_path = base / "data.bin"
    good = bin_path.read_bytes()

    def corrupt(offset, value, dtype):
        buf = bytearray(good)
        buf[offset:offset + onp.dtype(dtype).itemsize] = onp.asarray(
            [value], dtype).tobytes()
        return bytes(buf)

    cases = {
        "bad_magic": corrupt(0, 0xDEAD, onp.uint32),
        "bad_dtype": corrupt(4, 77, onp.uint32),
        "ndim_over_8": corrupt(8, 40, onp.uint32),
        "ndim_zero": corrupt(8, 0, onp.uint32),
        "zero_dim": corrupt(16, 0, onp.uint64),
        "huge_dim_overflow": corrupt(16, 1 << 60, onp.uint64),
        "count_past_eof": corrupt(80, 10**9, onp.uint64),
        "truncated_records": good[:4096 + 50],
    }
    for name, payload in cases.items():
        for use_native in (True, False):
            d = tmp_path / f"{name}_{use_native}"
            d.mkdir()
            (d / "data.bin").write_bytes(payload)
            with pytest.raises(ValueError):
                PatchStore(str(d), use_native=use_native)

    # the intact store still opens on both paths
    assert PatchStore(str(base), use_native=True)[1].shape == (4, 6, 2)
    assert PatchStore(str(base), use_native=False)[1].shape == (4, 6, 2)
