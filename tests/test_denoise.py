"""Inference-only serving CLI (tools/denoise.py): raw file in, denoised
sRGB PNG (and packed .npz) out — no ground truth, any frame geometry
(edge-pad to the network alignment and crop back), network from an orbax
checkpoint or a baked .eldx artifact."""

import json
import os

import numpy as onp

import jax
import jax.numpy as jnp

from eld_tpu.models import build_arch
from eld_tpu.tools.denoise import main
from eld_tpu.utils.images import load_png
from tests.tiff_fixture import make_dng


def _write_dng(path, h=72, w=80, seed=0):
    """A DARK frame: packed values ~[0, 0.0025] so x100-x300 stays
    unsaturated (the CLI's domain — amplifying short exposures)."""
    rng = onp.random.default_rng(seed)
    mosaic = (512 + rng.random((h, w)) * 40).astype(onp.uint16)
    path.write_bytes(make_dng(mosaic, iso=1600, exposure=0.04))
    return str(path)


def test_denoise_cli_from_checkpoint(tmp_path):
    """Unaligned geometry (packed 36x40, not /16) through a checkpoint:
    PNG + raw outputs exist, shapes/ranges are right."""
    from eld_tpu.train import create_train_state
    from eld_tpu.train.checkpoints import save_checkpoint

    raw_path = _write_dng(tmp_path / "IMG_0004.dng")
    model = build_arch("unet", 4, 4, base_width=8)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    ckpt = save_checkpoint(str(tmp_path / "ckpts"), state, label="latest")

    out = str(tmp_path / "denoised")
    res = main(["--input", raw_path, "--ratio", "100",
                "--model_path", ckpt, "--base_width", "8",
                "--out", out, "--save_raw"])
    assert len(res) == 1 and res[0]["ratio"] == 100.0
    rgb = load_png(res[0]["output"])
    assert rgb.shape == (36, 40, 3)  # half-size sRGB render (binning)
    z = onp.load(res[0]["raw_output"])
    assert z["packed"].shape == (36, 40, 4)
    assert 0.0 <= z["packed"].min() and z["packed"].max() <= 1.0
    assert onp.isfinite(z["packed"]).all()
    assert z["wb"].shape == (4,) and z["ccm"].shape == (3, 3)


def test_denoise_cli_s2d_alignment(tmp_path):
    """--arch unet_s2d has alignment 32, not 16: a 36x40 packed frame
    must pad to the arch's own alignment (a hardcoded 16 crashes in the
    decoder concat)."""
    from eld_tpu.train import create_train_state
    from eld_tpu.train.checkpoints import save_checkpoint

    raw_path = _write_dng(tmp_path / "IMG_0004.dng")  # packed 36x40
    model = build_arch("unet_s2d", 4, 4, base_width=8)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    ckpt = save_checkpoint(str(tmp_path / "ckpts"), state, label="latest")

    res = main(["--input", raw_path, "--ratio", "100",
                "--model_path", ckpt, "--arch", "unet_s2d",
                "--base_width", "8", "--out", str(tmp_path / "o")])
    assert load_png(res[0]["output"]).shape == (36, 40, 3)


def test_every_tool_has_a_cli_wrapper():
    """Console scripts run sys.exit(entry()); main() returns data (lists/
    dicts), which would turn every success into exit status 1 — so each
    tool exposes cli() returning 0, and pyproject points at it."""
    import importlib

    for tool in ("train_syn", "train_real", "test_sid", "test_eld",
                 "build_dataset", "convert_raw", "export_model", "denoise",
                 "vis_data", "demo_synthetic", "validate_pallas",
                 "bench_variants", "bench_decode", "roofline"):
        mod = importlib.import_module(f"eld_tpu.tools.{tool}")
        assert callable(getattr(mod, "cli")), tool
    pyproject = os.path.join(os.path.dirname(__file__), "..",
                             "pyproject.toml")
    scripts = open(pyproject).read().split("[project.scripts]")[1]
    assert ":main\"" not in scripts.split("\n[")[0]


def test_denoise_cli_all_vendor_formats(tmp_path):
    """The serving CLI end-to-end over every natively-decoded vendor
    format (ARW 2.3 / CR2 lossless-JPEG / NEF lossless), mixed frame
    geometries in one directory — each pads to its own alignment."""
    from eld_tpu.train import create_train_state
    from eld_tpu.train.checkpoints import save_checkpoint
    from tests.arw_fixture import make_arw
    from tests.cr2_fixture import make_cr2
    from tests.nef_fixture import make_nef

    rng = onp.random.default_rng(5)
    d = tmp_path / "raws"
    d.mkdir()
    (d / "a.ARW").write_bytes(make_arw(rng, width=64, height=8)[0])
    (d / "c.CR2").write_bytes(make_cr2(rng, visible=(8, 32), borders=(4, 2),
                                       slices=(2, 16), ncomp=2)[0])
    (d / "n.nef").write_bytes(make_nef(rng, size=(8, 32))[0])

    model = build_arch("unet", 4, 4, base_width=8)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    ckpt = save_checkpoint(str(tmp_path / "ckpts"), state, label="latest")

    out = str(tmp_path / "denoised")
    res = main(["--input", str(d), "--ratio", "100",
                "--model_path", ckpt, "--base_width", "8",
                "--out", out, "--save_raw"])
    assert len(res) == 3
    for rec in res:
        rgb = load_png(rec["output"])
        assert rgb.ndim == 3 and onp.isfinite(rgb).all()
        z = onp.load(rec["raw_output"])
        assert onp.isfinite(z["packed"]).all()
        assert 0.0 <= z["packed"].min() and z["packed"].max() <= 1.0


def test_denoise_pipelined_matches_sync(tmp_path):
    """The default pipelined serving (decode-ahead + background writes,
    --io_threads 2) must produce exactly the synchronous path's outputs:
    same records in the same order, identical pixels and raw dumps, for
    a mixed-geometry directory with batching."""
    from eld_tpu.train import create_train_state
    from eld_tpu.train.checkpoints import save_checkpoint

    d = tmp_path / "raws"
    d.mkdir()
    for i in range(3):
        _write_dng(d / f"a{i}.dng", h=64, w=64, seed=10 + i)
    for i in range(2):
        _write_dng(d / f"b{i}.dng", h=72, w=80, seed=20 + i)

    model = build_arch("unet", 4, 4, base_width=8)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    ckpt = save_checkpoint(str(tmp_path / "ckpts"), state, label="latest")

    runs = {}
    for tag, threads in (("sync", "0"), ("pipe", "2")):
        out = str(tmp_path / tag)
        runs[tag] = main(["--input", str(d), "--ratio", "100",
                          "--model_path", ckpt, "--base_width", "8",
                          "--batch", "2", "--io_threads", threads,
                          "--out", out, "--save_raw"])
    assert [r["input"] for r in runs["sync"]] == \
           [r["input"] for r in runs["pipe"]]  # grouping order preserved
    for rs, rp in zip(runs["sync"], runs["pipe"]):
        assert rs["ratio"] == rp["ratio"]
        assert onp.array_equal(load_png(rs["output"]),
                               load_png(rp["output"]))
        zs, zp = onp.load(rs["raw_output"]), onp.load(rp["raw_output"])
        for k in ("packed", "wb", "ccm"):
            assert onp.array_equal(zs[k], zp[k]), k

    # a corrupt file mid-directory surfaces its decode error through the
    # prefetch pool, at the same point the synchronous loop would raise
    import pytest

    from eld_tpu.data.rawio import UnsupportedRawError

    (d / "a9.dng").write_bytes(b"not a raw file at all")
    with pytest.raises(UnsupportedRawError):
        main(["--input", str(d), "--ratio", "100", "--model_path", ckpt,
              "--base_width", "8", "--out", str(tmp_path / "err")])


def test_denoise_cli_from_artifact_and_dir(tmp_path):
    """Directory of raws through a .eldx artifact; a geometry mismatch
    dies with the re-export hint instead of a StableHLO shape error."""
    import pytest

    from eld_tpu.export import save_denoiser

    d = tmp_path / "raws"
    d.mkdir()
    _write_dng(d / "a.dng", h=64, w=64, seed=1)
    _write_dng(d / "b.dng", h=64, w=64, seed=2)

    model = build_arch("unet", 4, 4, base_width=8)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 32, 32, 4)))["params"]
    art = str(tmp_path / "net.eldx")
    save_denoiser(art, model, params, 32, 32, platforms=("cpu",))

    out = str(tmp_path / "denoised")
    res = main(["--input", str(d), "--ratio", "300",
                "--artifact", art, "--out", out])
    assert len(res) == 2
    for rec in res:
        assert os.path.exists(rec["output"])
    # the two scenes differ -> outputs differ (params really ran per file)
    a = load_png(res[0]["output"]).astype(onp.float32)
    b = load_png(res[1]["output"]).astype(onp.float32)
    assert onp.abs(a - b).max() > 1.0

    # --batch 2: one forward for both frames, same rendered outputs
    out2 = str(tmp_path / "denoised_b2")
    res2 = main(["--input", str(d), "--ratio", "300", "--batch", "2",
                 "--artifact", art, "--out", out2])
    assert len(res2) == 2
    for r1, r2 in zip(sorted(res, key=lambda r: r["input"]),
                      sorted(res2, key=lambda r: r["input"])):
        d1 = load_png(r1["output"]).astype(onp.int16)
        d2 = load_png(r2["output"]).astype(onp.int16)
        assert onp.abs(d1 - d2).max() <= 1  # batched == single (quantized)

    # --target_exposure: per-file EXIF ratio (iso 1600 x 0.04 s inputs,
    # target 100 ISO x 10 s -> 1000/64)
    res3 = main(["--input", str(d / "a.dng"), "--target_exposure", "10",
                 "--artifact", art, "--out", out2])
    assert abs(res3[0]["ratio"] - (100.0 * 10.0) / (1600 * 0.04)) < 1e-9

    _write_dng(tmp_path / "big.dng", h=128, w=160, seed=3)
    with pytest.raises(SystemExit, match="re-export"):
        main(["--input", str(tmp_path / "big.dng"), "--ratio", "100",
              "--artifact", art, "--out", out])

    # a frame SMALLER than the artifact geometry serves by edge-padding
    # to the artifact's static dims and cropping back
    _write_dng(tmp_path / "small.dng", h=48, w=64, seed=7)  # packed 24x32
    res4 = main(["--input", str(tmp_path / "small.dng"), "--ratio", "100",
                 "--artifact", art, "--out", out])
    assert load_png(res4[0]["output"]).shape == (24, 32, 3)

    # model/arch flags are baked into artifacts -> explicit error
    # (concat is the non-default since the round-4 measured flip to split)
    with pytest.raises(SystemExit):
        main(["--input", str(d), "--ratio", "100", "--artifact", art,
              "--skip_mode", "concat", "--out", out])

    # a fully-saturated input (bright frame x huge ratio) must fall back
    # to the uncorrected output, not serve NaN-black images
    bright = tmp_path / "bright.dng"
    rng = onp.random.default_rng(9)
    bright.write_bytes(make_dng(
        (rng.random((64, 64)) * 4000 + 8000).astype(onp.uint16)))
    res = main(["--input", str(bright), "--ratio", "300",
                "--artifact", art, "--out", out])
    z = load_png(res[0]["output"])
    assert onp.isfinite(z).all()
