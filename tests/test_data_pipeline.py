"""Datasets, loader, builder — end-to-end host pipeline tests."""

import os

import numpy as onp
import pytest

from eld_tpu.data.builder import build_patch_db, extract_patches
from eld_tpu.data.datasets import (
    CleanPatchDataset,
    ConcatDataset,
    ELDEvalDataset,
    ELDTrainDataset,
    ISPDataset,
    SIDDataset,
    SynDataset,
)
from eld_tpu.data.loader import Loader
from eld_tpu.data.pairs import compute_expo_ratio, eval_pairs_by_ratio, sid_pairs
from eld_tpu.data.patchstore import PatchStore, PatchStoreWriter
from eld_tpu.noise.host import HostNoiseModel
from tests.tiff_fixture import make_dng


# ---------- fixtures ----------

@pytest.fixture
def sid_tree(tmp_path, rng):
    """A miniature SID directory: short/ and long/ with DNG pairs."""
    (tmp_path / "short").mkdir()
    (tmp_path / "long").mkdir()
    pairs = []
    for i in range(2):
        short_fn = f"{i:05d}_00_0.1s.dng"
        long_fn = f"{i:05d}_00_10s.dng"
        gt = rng.integers(2048, 16384, (64, 64)).astype(onp.uint16)
        dark = (512 + (gt.astype(onp.float32) - 512) / 100).astype(onp.uint16)
        (tmp_path / "long" / long_fn).write_bytes(make_dng(gt, iso=100, exposure=10))
        (tmp_path / "short" / short_fn).write_bytes(make_dng(dark, iso=100, exposure=0.1))
        pairs.append((short_fn, long_fn))
    return str(tmp_path), pairs


@pytest.fixture
def clean_store(tmp_path, rng):
    path = str(tmp_path / "clean.eps")
    with PatchStoreWriter(path, (32, 32, 4), dtype=onp.uint16) as w:
        for _ in range(6):
            w.append(rng.integers(0, 65536, (32, 32, 4)).astype(onp.uint16),
                     wb=onp.array([2.0, 1.0, 1.5, 1.0]), ccm=onp.eye(3))
    return PatchStore(path)


# ---------- pair lists ----------

def test_vendored_pair_lists():
    assert len(sid_pairs("train")) == 280
    assert len(sid_pairs("val")) == 36
    assert len(sid_pairs("test")) == 93
    buckets = eval_pairs_by_ratio()
    assert sum(len(v) for v in buckets.values()) == 45  # 15 scenes x 3 ratios


def test_expo_ratio():
    assert compute_expo_ratio("a_00_0.1s.ARW", "a_00_10s.ARW") == 100
    assert compute_expo_ratio("a_00_0.01s.ARW", "a_00_10s.ARW") == 300  # capped


# ---------- datasets ----------

def test_sid_dataset(sid_tree):
    root, pairs = sid_tree
    ds = SIDDataset(root, pairs, augment=False, memorize=True, patch_size=32)
    item = ds[0]
    assert item["input"].shape == (32, 32, 4)
    assert item["target"].shape == (32, 32, 4)
    assert 0 <= item["input"].min() and item["input"].max() <= 1
    # ratio x100 roughly cancels the /100 darkening: input ~ target
    assert onp.abs(item["input"] - item["target"]).mean() < 0.02
    # memoization caches decoded images (one target + one input per pair)
    assert len(ds._cache) == 2
    ds[1]
    assert len(ds._cache) == 4


def test_sid_dataset_augment_crop(sid_tree, rng):
    root, pairs = sid_tree
    ds = SIDDataset(root, pairs, augment=True, patch_size=16,
                    rng=onp.random.default_rng(0))
    item = ds[0]
    assert item["input"].shape == (16, 16, 4)


def test_clean_patch_dataset(clean_store):
    ds = CleanPatchDataset(clean_store, rng=onp.random.default_rng(0))
    item = ds[0]
    assert set(item) == {"clean"}
    assert item["clean"].shape == (32, 32, 4)


def test_eld_train_dataset(clean_store):
    noisy = SynDataset(clean_store, HostNoiseModel("g", rng=onp.random.default_rng(1)))
    ds = ELDTrainDataset(clean_store, [noisy], rng=onp.random.default_rng(0))
    assert len(ds) == 6
    item = ds[0]
    assert item["input"].shape == item["target"].shape == (32, 32, 4)
    assert onp.abs(item["input"] - item["target"]).mean() > 1e-5  # noise applied


def test_isp_dataset(clean_store):
    ds = ISPDataset(clean_store)
    out = ds[0]
    assert out.shape == (32, 32, 3)


def test_eld_eval_dataset(tmp_path, rng):
    base = tmp_path / "ELD"
    cam = "SonyA7S2"
    for scene in (1, 2):
        d = base / cam / f"scene-{scene}"
        d.mkdir(parents=True)
        gt = rng.integers(2048, 16384, (32, 32)).astype(onp.uint16)
        dark = (512 + (gt.astype(onp.float32) - 512) / 100).astype(onp.uint16)
        # nearest GT id to input 4 among {1,6,11,16} is 6
        (d / "IMG_0006.dng").write_bytes(make_dng(gt, iso=800, exposure=1.0))
        (d / "IMG_0004.dng").write_bytes(make_dng(dark, iso=800, exposure=0.01))
    ds = ELDEvalDataset(str(base), (cam, ".dng"), scenes=[1, 2], img_ids=[4])
    assert len(ds) == 2
    item = ds[0]
    assert item["ratio"] == pytest.approx(100, rel=1e-3)
    assert onp.abs(item["input"] - item["target"]).mean() < 0.02


def test_concat_dataset(clean_store):
    a = CleanPatchDataset(clean_store, size=2, augment=False)
    b = CleanPatchDataset(clean_store, size=3, augment=False)
    c = ConcatDataset([a, b])
    assert len(c) == 5
    onp.testing.assert_array_equal(c[2]["clean"], b[0]["clean"])


# ---------- loader ----------

def test_loader_batching(clean_store):
    ds = CleanPatchDataset(clean_store, augment=False)
    loader = Loader(ds, batch_size=4, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["clean"].shape == (4, 32, 32, 4)
    assert batches[1]["clean"].shape == (2, 32, 32, 4)


def test_loader_drop_last_and_shuffle_determinism(clean_store):
    ds = CleanPatchDataset(clean_store, augment=False)
    l1 = Loader(ds, batch_size=4, shuffle=True, seed=7, num_workers=0, drop_last=True)
    l2 = Loader(ds, batch_size=4, shuffle=True, seed=7, num_workers=0, drop_last=True)
    b1, b2 = next(iter(l1)), next(iter(l2))
    onp.testing.assert_array_equal(b1["clean"], b2["clean"])
    assert len(l1) == 1  # 6 // 4


def test_loader_mixed_fields(sid_tree):
    root, pairs = sid_tree
    ds = SIDDataset(root, pairs, augment=False, memorize=False, patch_size=32)
    loader = Loader(ds, batch_size=2, num_workers=0)
    batch = next(iter(loader))
    assert batch["input"].shape[0] == 2
    assert isinstance(batch["fn"], list)  # string field collates to list


# ---------- builder ----------

def test_extract_patches():
    img = onp.arange(8 * 10 * 2, dtype=onp.float32).reshape(8, 10, 2)
    patches = extract_patches(img, 4, 4)
    assert patches.shape == (4, 4, 4, 2)
    onp.testing.assert_array_equal(patches[0], img[0:4, 1:5])  # center-aligned grid


def test_build_patch_db(tmp_path, rng):
    raws = []
    for i in range(2):
        p = tmp_path / f"r{i}.dng"
        p.write_bytes(make_dng(rng.integers(512, 16384, (64, 64)).astype(onp.uint16)))
        raws.append(str(p))
    out = build_patch_db(raws, str(tmp_path / "db.eps"), patch=16, stride=16,
                         verbose=False)
    store = PatchStore(out)
    assert len(store) == 2 * 4  # (32/16)^2 per file after packing to 32x32x4
    assert store.shape == (16, 16, 4)
    assert store.meta["wb"].shape[0] == len(store)


def test_build_patch_db_refuses_overwrite(tmp_path, rng):
    p = tmp_path / "r.dng"
    p.write_bytes(make_dng(rng.integers(512, 16384, (64, 64)).astype(onp.uint16)))
    build_patch_db([str(p)], str(tmp_path / "db.eps"), patch=16, stride=16, verbose=False)
    with pytest.raises(FileExistsError):
        build_patch_db([str(p)], str(tmp_path / "db.eps"), patch=16, stride=16,
                       verbose=False)


def test_loader_multihost_sharding(clean_store):
    """Two 'hosts' with the same seed partition every global batch."""
    ds = CleanPatchDataset(clean_store, augment=False)
    full = Loader(ds, batch_size=4, shuffle=True, seed=3, num_workers=0, drop_last=True)
    h0 = Loader(ds, batch_size=4, shuffle=True, seed=3, num_workers=0, drop_last=True,
                shard=(0, 2))
    h1 = Loader(ds, batch_size=4, shuffle=True, seed=3, num_workers=0, drop_last=True,
                shard=(1, 2))
    b_full = next(iter(full))["clean"]
    b0 = next(iter(h0))["clean"]
    b1 = next(iter(h1))["clean"]
    assert b0.shape[0] == b1.shape[0] == 2
    onp.testing.assert_array_equal(onp.concatenate([b0, b1]).sum(), b_full.sum())
    with pytest.raises(ValueError):
        Loader(ds, batch_size=3, shard=(0, 2))


def test_loader_set_epoch(clean_store):
    ds = CleanPatchDataset(clean_store, augment=False)
    l1 = Loader(ds, batch_size=4, shuffle=True, seed=5, num_workers=0)
    l2 = Loader(ds, batch_size=4, shuffle=True, seed=5, num_workers=0)
    l1.set_epoch(7)
    l2.set_epoch(7)
    onp.testing.assert_array_equal(next(iter(l1))["clean"], next(iter(l2))["clean"])


def test_loader_propagates_dataset_errors(clean_store):
    """A dataset exception in the producer thread must surface in the
    consumer, not hang the training loop (regression)."""

    class Exploding(Dataset := CleanPatchDataset):
        def __getitem__(self, i):
            if i == 3:
                raise RuntimeError("corrupt record")
            return super().__getitem__(i)

    ds = Exploding(clean_store, augment=False)
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="corrupt record"):
        list(loader)


def test_prefetched_map_order_and_errors():
    """prefetched_map yields fn(item) in input order with bounded
    concurrency; an exception surfaces at the failing item's position,
    after the preceding items — exactly the synchronous order."""
    from eld_tpu.data.loader import prefetched_map

    out = list(prefetched_map(lambda x: x * 2, range(10), workers=3, window=4))
    assert out == [x * 2 for x in range(10)]
    assert list(prefetched_map(lambda x: x, range(3), 0, 4)) == [0, 1, 2]

    def boom(x):
        if x == 5:
            raise ValueError("item 5")
        return x

    got = []
    with pytest.raises(ValueError, match="item 5"):
        for v in prefetched_map(boom, range(10), 3, 4):
            got.append(v)
    assert got == [0, 1, 2, 3, 4]


def test_readahead_passthrough_and_errors():
    """readahead is an exact pass-through (same items incl. None, same
    order, exceptions at their position); size<=0 returns the iterator."""
    from eld_tpu.data.loader import readahead

    assert list(readahead(iter(range(7)), 2)) == list(range(7))
    it = iter(range(3))
    assert readahead(it, 0) is it

    def gen():
        yield 1
        yield None  # None is a legal item (the sentinel is private)
        raise RuntimeError("producer died")

    got = []
    with pytest.raises(RuntimeError, match="producer died"):
        for v in readahead(gen(), 2):
            got.append(v)
    assert got == [1, None]


def test_build_dataset_cli(tmp_path, rng):
    """build_dataset CLI: clean recipe over a fixture SID tree."""
    from eld_tpu.data.pairs import sid_pairs
    from eld_tpu.tools import build_dataset

    src = tmp_path / "SID"
    (src / "long").mkdir(parents=True)
    # the recipe reads the vendored train list; provide its first long file
    long_fn = sorted({fn[1] for fn in sid_pairs("train")})[0]
    mosaic = rng.integers(512, 16384, (64, 64)).astype(onp.uint16)
    (src / "long" / long_fn).write_bytes(make_dng(mosaic))

    dest = tmp_path / "Train"
    dest.mkdir()
    build_dataset.main(["clean", "--sourcedir", str(src), "--destdir", str(dest),
                        "--num_samples", "1", "--patch", "16", "--stride", "16"])
    store = PatchStore(str(dest / "SID_Sony_Raw.eps"))
    assert len(store) == 4  # 32x32 packed -> four 16x16 patches
    assert store.shape == (16, 16, 4)

    # all-inputs-too-small must fail loudly, not write an empty store
    dest2 = tmp_path / "Train2"
    dest2.mkdir()
    with pytest.raises(ValueError, match="no patches"):
        build_dataset.main(["clean", "--sourcedir", str(src), "--destdir",
                            str(dest2), "--num_samples", "1"])


def test_sid_dataset_native_arw(tmp_path, rng):
    """SIDDataset end-to-end over NATIVE-decoded Sony ARW 2.3 files — the
    actual SID dataset format (reference reads them at sid_dataset.py:88)."""
    from tests.arw_fixture import make_arw

    (tmp_path / "short").mkdir()
    (tmp_path / "long").mkdir()
    pairs = []
    for i in range(2):
        short_fn, long_fn = f"{i:05d}_00_0.1s.ARW", f"{i:05d}_00_10s.ARW"
        (tmp_path / "long" / long_fn).write_bytes(
            make_arw(rng, width=64, height=64, iso=100, exposure=10)[0])
        (tmp_path / "short" / short_fn).write_bytes(
            make_arw(rng, width=64, height=64, iso=100, exposure=0.1)[0])
        pairs.append((short_fn, long_fn))

    ds = SIDDataset(str(tmp_path), pairs, augment=False, memorize=False)
    item = ds[0]
    assert item["input"].shape == (32, 32, 4)
    assert item["target"].shape == (32, 32, 4)
    assert 0 <= item["input"].min() and item["input"].max() <= 1


def test_parse_pairs_file(tmp_path):
    """tools/test_sid --pairs: comments/blanks skipped, float ratios
    accepted, malformed lines exit with the offending file:line."""
    import pytest

    from eld_tpu.tools.test_sid import parse_pairs_file

    p = tmp_path / "pairs.txt"
    p.write_text("# header comment\n"
                 "\n"
                 "short1.ARW long1.ARW 250\n"
                 "short2.ARW long2.ARW 250.0\n"
                 "short3.ARW long3.ARW 100\n")
    buckets = parse_pairs_file(str(p))
    assert buckets == {250: [("short1.ARW", "long1.ARW"),
                             ("short2.ARW", "long2.ARW")],
                      100: [("short3.ARW", "long3.ARW")]}

    bad = tmp_path / "bad.txt"
    bad.write_text("short.ARW long.ARW\n")
    with pytest.raises(SystemExit, match="bad.txt:1"):
        parse_pairs_file(str(bad))
    bad.write_text("a.ARW b.ARW x300\n")
    with pytest.raises(SystemExit, match="not a number"):
        parse_pairs_file(str(bad))


# ---------- review-fix regressions (round 3) ----------

def test_augmentation_is_worker_count_independent(clean_store):
    """Per-(epoch, index) RNG streams: the same seed gives the same
    augmented samples whether __getitem__ runs single-threaded or on 4
    concurrent workers (a shared numpy Generator was thread-unsafe and
    scheduling-dependent)."""
    def run(workers):
        ds = CleanPatchDataset(clean_store, rng=onp.random.default_rng(7))
        loader = Loader(ds, batch_size=2, shuffle=True, num_workers=workers,
                        seed=3)
        return [onp.asarray(b["clean"]) for b in loader]

    a, b = run(0), run(4)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        onp.testing.assert_array_equal(x, y)


def test_augmentation_varies_by_epoch_and_repeat(clean_store):
    ds = CleanPatchDataset(clean_store, repeat=2,
                           rng=onp.random.default_rng(7))
    n = len(clean_store)
    # repeat-virtualized revisit of the same record: distinct augmentation
    items = [ds[i]["clean"] for i in (0, n)]
    assert not onp.array_equal(items[0], items[1])
    # epochs differ
    e0 = ds[0]["clean"]
    ds.set_epoch(1)
    assert not onp.array_equal(e0, ds[0]["clean"])


def test_sid_crop_accepts_exact_patch_size(sid_tree):
    root, pairs = sid_tree
    ds = SIDDataset(root, pairs, augment=True, patch_size=32,
                    memorize=False, rng=onp.random.default_rng(0))
    item = ds[0]  # frames are exactly 32x32 packed -> offset 0 crop
    assert item["input"].shape == (32, 32, 4)


def test_isp_dataset_meta_follows_size_virtualization(clean_store, tmp_path, rng):
    """With size < count, item i reads record i%size — the wb/ccm row
    must follow the STORE's mapping, not a modulo by the meta length."""
    path = str(tmp_path / "meta.eps")
    with PatchStoreWriter(path, (8, 8, 4), dtype=onp.uint16) as w:
        for k in range(4):
            w.append(onp.full((8, 8, 4), 0.25, onp.float32),
                     wb=onp.array([1.0 + k, 1.0, 1.0, 1.0]), ccm=onp.eye(3))
    store = PatchStore(path, size=2, repeat=2)  # items 0..3 -> records 0,1,0,1
    ds = ISPDataset(store)
    # item 2 maps to record 0: its render must equal item 0's, and differ
    # from what record-2's wb (gain 3.0) would produce
    onp.testing.assert_array_equal(ds[2], ds[0])
    assert not onp.array_equal(ds[2], ds[1])


def test_patchstore_rejects_oversized_size(clean_store):
    with pytest.raises(ValueError, match="exceeds"):
        PatchStore(clean_store.path, size=len(clean_store) + 1)


def test_extract_patches_small_image_yields_zero():
    out = extract_patches(onp.zeros((20, 200, 4), onp.float32), 64, 32)
    assert out.shape[0] == 0
    out = extract_patches(onp.zeros((20, 20, 4), onp.float32), 64, 32)
    assert out.shape[0] == 0


def test_read_expo_time_any_extension():
    from eld_tpu.data.pairs import read_expo_time

    assert read_expo_time("00001_00_0.04s.ARW") == 0.04
    assert read_expo_time("00001_00_0.04s.tiff") == 0.04
    assert read_expo_time("00001_00_10s.rawpack") == 10.0
    with pytest.raises(ValueError):
        read_expo_time("00001_00_noexpo.ARW")


def test_rawpack_scalar_black_and_xtrans_phase_guard(tmp_path):
    from eld_tpu.data import rawio

    p = str(tmp_path / "a.npz")
    onp.savez(p, mosaic=onp.full((8, 8), 1000, onp.uint16), black_level=512)
    raw = rawio.imread(p)
    assert raw.black_level.shape == (4,)
    assert raw.packed().shape == (4, 4, 4)

    # xtrans WITHOUT a 6x6 pattern must refuse, not pack at a guessed phase
    x = str(tmp_path / "x.npz")
    onp.savez(x, mosaic=onp.full((12, 12), 1000, onp.uint16),
              black_level=512, cfa="xtrans")
    with pytest.raises(rawio.UnsupportedRawError, match="6, 6"):
        rawio.imread(x).packed()
