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
