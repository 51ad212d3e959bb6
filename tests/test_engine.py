"""Engine + checkpoint + CLI end-to-end tests (tiny fixture data)."""

import os

import numpy as onp
import pytest

from eld_tpu.config import Config
from eld_tpu.data.datasets import CleanPatchDataset
from eld_tpu.data.loader import Loader
from eld_tpu.data.patchstore import PatchStore, PatchStoreWriter
from eld_tpu.train.engine import Engine


@pytest.fixture
def clean_store(tmp_path, rng):
    path = str(tmp_path / "clean.eps")
    with PatchStoreWriter(path, (32, 32, 4), dtype=onp.uint16) as w:
        for _ in range(8):
            w.append(rng.integers(0, 65536, (32, 32, 4)).astype(onp.uint16),
                     wb=onp.array([2.0, 1.0, 1.5, 1.0]), ccm=onp.eye(3))
    return path


def small_cfg(tmp_path, **kw):
    base = dict(
        name="t", checkpoints_dir=str(tmp_path / "ckpt"), is_train=True,
        batch_size=4, mesh_data=2, noise="pg", include=4, no_log=True,
        no_verbose=True, n_threads=0, save_epoch_freq=1, async_ckpt=False,
        base_width=8,  # small model: full-width compiles dominate CI time
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_engine_train_eval_cycle(tmp_path, clean_store, rng):
    cfg = small_cfg(tmp_path)
    engine = Engine(cfg)
    ds = CleanPatchDataset(PatchStore(clean_store), rng=onp.random.default_rng(0))
    loader = Loader(ds, batch_size=4, shuffle=True, num_workers=0, drop_last=True)

    meters = engine.train(loader)
    assert engine.epoch == 1
    assert engine.iterations == 2
    assert "Pixel" in meters.keys()

    # eval protocol on a synthetic pair
    item = {
        "input": rng.random((32, 32, 4), dtype=onp.float32),
        "target": rng.random((32, 32, 4), dtype=onp.float32),
        "fn": "synthetic",
    }
    res = engine.eval_one(item, correct=True, crop=False)
    assert set(res) == {"PSNR", "SSIM", "PSNR_in", "SSIM_in"}


def test_eval_batch_matches_per_item(tmp_path, clean_store, rng):
    """Batched eval must equal per-item batch-1 eval (every batch item is
    corrected and scored individually, like the reference's corrector loop)."""
    cfg = small_cfg(tmp_path, is_train=False)
    engine = Engine(cfg)
    inp = rng.random((3, 32, 32, 4), dtype=onp.float32)
    tgt = rng.random((3, 32, 32, 4), dtype=onp.float32)
    batched = engine.eval_one({"input": inp, "target": tgt}, correct=True, crop=False)
    singles = [engine.eval_one({"input": inp[i], "target": tgt[i]},
                               correct=True, crop=False) for i in range(3)]
    for k in batched:
        assert batched[k] == pytest.approx(onp.mean([s[k] for s in singles]), abs=1e-4)


def test_eval_prefetch_matches_sync(tmp_path, rng):
    """Engine.eval's decode read-ahead (prefetch=2, the default) must
    reproduce the synchronous loop's metrics exactly — readahead only
    moves WHEN items materialize, never what or in which order."""
    cfg = small_cfg(tmp_path, is_train=False)
    engine = Engine(cfg)
    items = [{"input": rng.random((32, 32, 4), dtype=onp.float32),
              "target": rng.random((32, 32, 4), dtype=onp.float32)}
             for _ in range(5)]
    m0 = engine.eval(items, dataset_name="sync", crop=False, prefetch=0)
    m2 = engine.eval(items, dataset_name="pipe", crop=False, prefetch=2)
    assert m0.as_dict() == m2.as_dict()


@pytest.mark.slow
def test_engine_checkpoint_roundtrip(tmp_path, clean_store):
    cfg = small_cfg(tmp_path, no_log=False)
    engine = Engine(cfg)
    ds = CleanPatchDataset(PatchStore(clean_store), rng=onp.random.default_rng(0))
    loader = Loader(ds, batch_size=4, shuffle=False, num_workers=0, drop_last=True)
    engine.train(loader)
    path = engine.save(label="latest")
    assert os.path.exists(path)

    cfg2 = small_cfg(tmp_path, resume=True)
    engine2 = Engine(cfg2)
    assert engine2.epoch == engine.epoch
    assert engine2.iterations == engine.iterations
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(engine.state.params),
                    jax.tree_util.tree_leaves(engine2.state.params)):
        onp.testing.assert_array_equal(onp.asarray(a), onp.asarray(b))


def test_restore_params_skips_opt_state_and_diagnoses_mismatch(tmp_path, clean_store):
    """restore_params must (a) round-trip params without needing an
    optimizer template, (b) reject a wrong-arch template with a per-leaf
    diagnostic naming the offending path, not an opaque orbax error."""
    import jax
    import pytest

    from eld_tpu.train.checkpoints import restore_params

    cfg = small_cfg(tmp_path)
    engine = Engine(cfg)
    engine.state = engine.state.replace(epoch=engine.state.epoch + 3)
    path = engine.save(label="latest")

    params, epoch, iters = restore_params(path, engine.state.params)
    assert epoch == 3 and iters == int(engine.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(engine.state.params),
                    jax.tree_util.tree_leaves(params)):
        onp.testing.assert_array_equal(onp.asarray(a), onp.asarray(b))

    # wrong structure: template with an extra leaf
    bad = dict(engine.state.params)
    bad["phantom"] = {"kernel": onp.zeros((3, 3), onp.float32)}
    with pytest.raises(ValueError, match="phantom"):
        restore_params(path, bad)

    # wrong shape on the leaves
    bad2 = jax.tree_util.tree_map(
        lambda v: onp.zeros(onp.asarray(v).shape + (1,), onp.float32),
        engine.state.params)
    with pytest.raises(ValueError, match="shape"):
        restore_params(path, bad2)


def test_engine_numbered_checkpoint_discovery(tmp_path, clean_store):
    from eld_tpu.train.checkpoints import find_checkpoint

    cfg = small_cfg(tmp_path)
    engine = Engine(cfg)
    engine.state = engine.state.replace(epoch=engine.state.epoch + 5)
    p5 = engine.save()
    engine.state = engine.state.replace(epoch=engine.state.epoch + 5)
    p10 = engine.save()
    assert find_checkpoint(cfg.save_dir) == p10
    assert find_checkpoint(cfg.save_dir, epoch=5) == p5
    assert find_checkpoint(cfg.save_dir, epoch=7) is None


def test_engine_srgb_eval_stage(tmp_path, clean_store, rng):
    cfg = small_cfg(tmp_path, stage_eval="srgb", crf=True)
    engine = Engine(cfg)
    item = {
        "input": rng.random((32, 32, 4), dtype=onp.float32),
        "target": rng.random((32, 32, 4), dtype=onp.float32),
        "wb": onp.array([1.9, 1.0, 1.6, 1.0], onp.float32),
        "ccm": onp.eye(3, dtype=onp.float32),
        "fn": "synthetic",
    }
    res = engine.eval_one(item, correct=True, crop=False)
    assert onp.isfinite(res["PSNR"])


def test_engine_png_dumps(tmp_path, clean_store, rng):
    cfg = small_cfg(tmp_path)
    engine = Engine(cfg)
    item = {
        "input": rng.random((32, 32, 4), dtype=onp.float32),
        "target": rng.random((32, 32, 4), dtype=onp.float32),
        "fn": "scene1.dng",
    }
    savedir = str(tmp_path / "dump")
    engine.eval_one(item, correct=True, crop=False, savedir=savedir)
    files = os.listdir(os.path.join(savedir, "scene1"))
    assert any(f.startswith("t_") or f == "t_label.png" for f in files)
    assert len(files) == 3


@pytest.mark.slow
def test_train_syn_cli_smoke(tmp_path, clean_store, rng, monkeypatch):
    """The flagship CLI end-to-end on fixture data (2 epochs)."""
    traindir = tmp_path / "Train"
    traindir.mkdir()
    # the CLI expects SID_Sony_Raw.eps
    import shutil

    shutil.copytree(clean_store, traindir / "SID_Sony_Raw.eps")
    from eld_tpu.tools import train_syn

    engine = train_syn.main([
        "--traindir", str(traindir), "--evaldir", str(tmp_path / "missing"),
        "--epochs", "2", "--name", "cli_t", "--noise", "pg", "--include", "4",
        "-b", "4", "--mesh_data", "2", "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--base_width", "8", "--no-log", "--no-verbose", "--nThreads", "0",
    ])
    assert engine.epoch == 2
    assert engine.iterations == 4

    # --multihost in an already-initialized single process is a hard error
    # (strict): the backend came up before initialize() could run, so on
    # a real pod the hosts would silently train uncoordinated.  (A fresh
    # CLI process with no detectable cluster is ALSO a hard error now —
    # ValueError — since the user asked for multihost by name.)
    import pytest

    with pytest.raises(RuntimeError, match="multihost"):
        train_syn.main([
            "--traindir", str(traindir), "--evaldir", str(tmp_path / "missing"),
            "--epochs", "1", "--name", "cli_t2", "--noise", "pg",
            "--include", "4", "-b", "4", "--mesh_data", "2",
            "--checkpoints_dir", str(tmp_path / "ckpt"), "--base_width", "8",
            "--no-log", "--no-verbose", "--nThreads", "0", "--multihost",
        ])


def test_async_checkpoint(tmp_path, clean_store):
    from eld_tpu.train.checkpoints import wait_for_saves

    cfg = small_cfg(tmp_path, async_ckpt=True)
    engine = Engine(cfg)
    path = engine.save(label="latest")
    wait_for_saves()
    assert os.path.exists(path)
    cfg2 = small_cfg(tmp_path, resume=True)
    engine2 = Engine(cfg2)  # load() waits for in-flight saves itself
    assert engine2.iterations == engine.iterations


@pytest.mark.slow
def test_resume_is_bit_deterministic(tmp_path, clean_store):
    """Uninterrupted training == save/restore/continue, parameter-exact.

    Requires (a) per-step keys derived from the iteration counter and
    (b) loader epoch-seeded shuffling — the TPU-world reproducibility
    story replacing the reference's global-seed footwork."""
    import jax

    def loader():
        ds = CleanPatchDataset(PatchStore(clean_store),
                               rng=onp.random.default_rng(0), augment=False)
        return Loader(ds, batch_size=4, shuffle=True, num_workers=0, drop_last=True)

    # run A: 2 epochs straight
    a = Engine(small_cfg(tmp_path, name="detA"))
    la = loader()
    a.train(la)
    a.train(la)

    # run B: 1 epoch, checkpoint, fresh engine resumes, 1 more epoch
    b1 = Engine(small_cfg(tmp_path, name="detB"))
    lb = loader()
    b1.train(lb)
    b1.save(label="latest", wait=True)
    b2 = Engine(small_cfg(tmp_path, name="detB", resume=True))
    b2.train(lb)

    assert a.iterations == b2.iterations
    for x, y in zip(jax.tree_util.tree_leaves(a.state.params),
                    jax.tree_util.tree_leaves(b2.state.params)):
        onp.testing.assert_array_equal(onp.asarray(x), onp.asarray(y))


def test_engine_spatial_eval(tmp_path, clean_store, rng):
    """Eval with the spatial mesh axis active (full-frame halo sharding)."""
    cfg = small_cfg(tmp_path, is_train=False, mesh_data=2, mesh_spatial=4,
                    batch_size=1)
    engine = Engine(cfg)
    item = {
        "input": rng.random((128, 64, 4), dtype=onp.float32),
        "target": rng.random((128, 64, 4), dtype=onp.float32),
        "fn": "synthetic",
    }
    res = engine.eval_one(item, correct=True, crop=False)
    assert onp.isfinite(res["PSNR"])


def test_engine_test_mode(tmp_path, clean_store, rng):
    """Inference-only pass with sRGB preview dumps (reference .test())."""
    cfg = small_cfg(tmp_path, is_train=False)
    engine = Engine(cfg)
    items = [{
        "input": rng.random((32, 32, 4), dtype=onp.float32),
        "fn": f"frame{i}.dng",
        "wb": onp.array([1.9, 1.0, 1.6, 1.0], onp.float32),
        "ccm": onp.eye(3, dtype=onp.float32),
    } for i in range(2)]
    savedir = str(tmp_path / "test_out")
    engine.test(items, savedir=savedir)
    assert sorted(os.listdir(savedir)) == ["frame0", "frame1"]
    assert os.path.exists(os.path.join(savedir, "frame0", "t.png"))


def test_vis_data_cli(tmp_path, clean_store):
    from eld_tpu.tools import vis_data

    outdir = str(tmp_path / "vis")
    vis_data.main(["--store", clean_store, "--outdir", outdir, "-n", "3",
                   "--noise", "g"])
    assert len(os.listdir(outdir)) == 3


def test_multiprocess_coherence_and_host0_gating(tmp_path, clean_store, monkeypatch):
    """On a multi-process runtime the Engine must (a) refuse to run
    without cfg.multihost (silent batch duplication otherwise), and
    (b) with it, gate TB/eval work to process 0 while still ENTERING the
    collective checkpoint save on every process (orbax save barriers
    across hosts; a host-0-only entry would deadlock a real pod — the
    true 2-process run is tests/test_multiprocess.py)."""
    import pytest

    import eld_tpu.train.engine as engine_mod

    cfg = small_cfg(tmp_path)
    monkeypatch.setattr(engine_mod.jax, "process_count", lambda: 2)
    with pytest.raises(RuntimeError, match="multihost"):
        Engine(cfg)

    cfg2 = small_cfg(tmp_path)
    cfg2.multihost = True
    cfg2.mesh_spatial = 2
    with pytest.raises(NotImplementedError, match="spatial"):
        Engine(cfg2)

    cfg3 = small_cfg(tmp_path, no_log=False)
    cfg3.multihost = True
    monkeypatch.setattr(engine_mod.jax, "process_index", lambda: 1)
    eng = Engine(cfg3)
    assert not eng.host0
    assert eng.writer is None          # TB owned by process 0
    # save is collective: every process must ENTER it (orbax starts with a
    # global barrier — a host-0-only entry deadlocks).  The real write is
    # stubbed here because orbax's barrier would see the fake process
    # count; the genuine 2-process collective is proven in
    # tests/test_multiprocess.py.
    calls = []
    monkeypatch.setattr(engine_mod.ckpt, "save_checkpoint",
                        lambda *a, **k: calls.append(a) or "/fake/path.ckpt")
    assert eng.save(label="latest") == "/fake/path.ckpt"
    assert len(calls) == 1
    # pod eval shards items by stride and merges sums via the allgather
    # collective (stubbed to identity — the fake process count would make
    # the real collective reshape 8 local devices into 2 processes).
    # This rank-1 process sees items 1 and 3 of a 4-item loader.
    import eld_tpu.parallel.multihost as mh

    monkeypatch.setattr(mh, "allgather_objects", lambda obj, **k: [obj])
    seen = []
    monkeypatch.setattr(
        eng, "eval_one",
        lambda item, **k: seen.append(item["i"]) or {"PSNR": float(item["i"])})
    res = eng.eval([{"i": i} for i in range(4)], dataset_name="x")
    assert seen == [1, 3]
    assert res["PSNR"] == 2.0  # mean of this rank's shard after merge
    assert len(list(eng.eval([], dataset_name="x").keys())) == 0


def test_variant_flags_reach_model_and_checkpoint_interchange(tmp_path, clean_store):
    """--skip_mode/--upsample plumb through Config -> Engine -> build_arch,
    and a checkpoint written by the stock decoder restores into the
    variant decoder unchanged (exact re-parameterization)."""
    from eld_tpu.config import parse

    cfg = parse(["--name", "t", "--skip_mode", "split", "--upsample", "d2s",
                 "--checkpoints_dir", str(tmp_path / "c1")], dump=False)
    assert (cfg.skip_mode, cfg.upsample) == ("split", "d2s")

    base = Engine(small_cfg(tmp_path))
    path = base.save(label="latest")
    var = Engine(small_cfg(tmp_path, skip_mode="split", upsample="d2s"))
    var.load(path)
    import jax

    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(base.state.params),
            jax.tree_util.tree_leaves_with_path(var.state.params)):
        assert ka == kb
        onp.testing.assert_array_equal(onp.asarray(a), onp.asarray(b))


def test_best_checkpoint_direction_and_persistence(tmp_path, clean_store, monkeypatch):
    """best-checkpoint tracking is direction-aware (PSNR/SSIM maximized —
    the reference's `val < best` would track the WORST model), per-dataset,
    and persisted across --resume (best_val.json)."""
    eng = Engine(small_cfg(tmp_path))
    saves = []
    monkeypatch.setattr(eng, "save", lambda label=None, **k: saves.append(label))
    vals = iter([30.0, 31.2, 28.0])
    monkeypatch.setattr(eng, "eval_one", lambda item, **k: {"PSNR": next(vals)})

    eng.eval([{}], dataset_name="d1", loss_key="PSNR")   # first -> best
    eng.eval([{}], dataset_name="d1", loss_key="PSNR")   # 31.2 > 30 -> best
    eng.eval([{}], dataset_name="d1", loss_key="PSNR")   # 28 < 31.2 -> no
    assert saves == ["best_PSNR_d1", "best_PSNR_d1"]

    # per-dataset threshold: a different dataset starts fresh
    vals2 = iter([10.0])
    monkeypatch.setattr(eng, "eval_one", lambda item, **k: {"PSNR": next(vals2)})
    eng.eval([{}], dataset_name="d2", loss_key="PSNR")
    assert saves[-1] == "best_PSNR_d2"

    # loss-like keys are minimized
    vals3 = iter([0.5, 0.7, 0.3])
    monkeypatch.setattr(eng, "eval_one", lambda item, **k: {"Pixel": next(vals3)})
    eng.eval([{}], dataset_name="d3", loss_key="Pixel")
    eng.eval([{}], dataset_name="d3", loss_key="Pixel")  # 0.7 worse -> no
    eng.eval([{}], dataset_name="d3", loss_key="Pixel")  # 0.3 better -> yes
    assert saves.count("best_Pixel_d3") == 2

    # a FAILED best-save must not record the value: the next eval at the
    # same quality has to retry the checkpoint (persisting first would
    # permanently block that quality level after a crash mid-save)
    def boom(label=None, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(eng, "save", boom)
    vals4 = iter([20.0, 20.0])
    monkeypatch.setattr(eng, "eval_one", lambda item, **k: {"PSNR": next(vals4)})
    with pytest.raises(RuntimeError, match="disk full"):
        eng.eval([{}], dataset_name="d4", loss_key="PSNR")
    assert "d4/PSNR" not in eng.best_val
    saves4 = []
    monkeypatch.setattr(eng, "save", lambda label=None, **k: saves4.append(label))
    eng.eval([{}], dataset_name="d4", loss_key="PSNR")   # same 20.0 retries
    assert saves4 == ["best_PSNR_d4"] and eng.best_val["d4/PSNR"] == 20.0

    # persistence: a resumed engine must not treat the first eval as best
    eng.save = Engine.save.__get__(eng)  # restore the real save
    eng.save(label="latest")
    eng2 = Engine(small_cfg(tmp_path, resume=True))
    assert eng2.best_val["d1/PSNR"] == 31.2
    saves2 = []
    monkeypatch.setattr(eng2, "save", lambda label=None, **k: saves2.append(label))
    monkeypatch.setattr(eng2, "eval_one", lambda item, **k: {"PSNR": 29.0})
    eng2.eval([{}], dataset_name="d1", loss_key="PSNR")  # 29 < 31.2 -> no
    assert saves2 == []


def test_crop_center_rejects_small_images():
    import pytest

    from eld_tpu.core.packing import crop_center

    with pytest.raises(ValueError, match="smaller than"):
        crop_center(onp.zeros((1, 256, 600, 4), onp.float32), 512, 512)


def test_pod_eval_skips_loading_other_hosts_items(tmp_path, clean_store, rng, monkeypatch):
    """On pods, batch-1 unshuffled eval Loaders are indexed directly so a
    host never loads/decodes items belonging to other ranks (full-frame
    raws are multi-MB)."""
    import eld_tpu.train.engine as engine_mod
    import eld_tpu.parallel.multihost as mh

    eng = Engine(small_cfg(tmp_path))
    fetched = []

    class CountingDataset:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            fetched.append(i)
            return {"input": rng.random((16, 16, 4), dtype=onp.float32),
                    "target": rng.random((16, 16, 4), dtype=onp.float32)}

    loader = Loader(CountingDataset(), batch_size=1, num_workers=0)
    monkeypatch.setattr(engine_mod.jax, "process_count", lambda: 2)
    monkeypatch.setattr(engine_mod.jax, "process_index", lambda: 1)
    monkeypatch.setattr(mh, "allgather_objects", lambda obj, **k: [obj, obj])
    res = eng.eval(loader, dataset_name="x", correct=True, crop=False)
    assert fetched == [1, 3, 5]          # only this rank's stride
    assert onp.isfinite(res["PSNR"])


@pytest.mark.slow
def test_engine_train_pool_scan_path(tmp_path, clean_store):
    """train_pool: scanned epochs advance counters, drop the loss, save
    checkpoints, and resume onto the same step count."""
    import jax

    from eld_tpu.data.loader import pool_to_device

    cfg = small_cfg(tmp_path)
    engine = Engine(cfg)
    pool = {"clean": pool_to_device(PatchStore(clean_store), engine.mesh)}
    assert pool["clean"].dtype == jax.numpy.uint16  # raw records, not f32

    m0 = engine.train_pool(pool, steps=6, steps_per_call=3)
    assert engine.epoch == 1
    assert engine.iterations == 6
    for _ in range(3):
        m = engine.train_pool(pool, steps=6, steps_per_call=3)
    assert engine.iterations == 24
    assert m["Pixel"] < m0["Pixel"]

    # steps that are NOT a launch multiple run EXACTLY (a remainder launch
    # is compiled for the tail, not rounded up to a full launch)
    engine.train_pool(pool, steps=7, steps_per_call=3)
    assert engine.iterations == 31
