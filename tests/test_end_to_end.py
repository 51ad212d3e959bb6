"""End-to-end learning and CLI protocol tests on fixture data."""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as onp
import pytest

from eld_tpu.models import build_arch
from eld_tpu.noise import load_camera_params
from eld_tpu.noise.params import NoiseParams
from eld_tpu.ops.metrics import psnr
from eld_tpu.train import create_train_state, make_train_step, make_eval_forward
from tests.tiff_fixture import make_dng


def _smooth_images(rng, n, size=32):
    """Clean low-frequency images (what a denoiser can actually learn)."""
    xs = []
    for _ in range(n):
        f = rng.random((4, 4, 4)).astype(onp.float32)
        up = onp.kron(f, onp.ones((size // 4, size // 4, 1), onp.float32))
        xs.append(up * 0.6 + 0.2)
    return onp.stack(xs)


@pytest.mark.slow
def test_denoiser_actually_denoises(rng):
    """Train briefly on 'g' noise over smooth images; the net must beat
    the identity (PSNR of denoised > PSNR of noisy input) on held-out data.
    """
    model = build_arch("unet", 4, 4, base_width=8)
    bank = load_camera_params(include=4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 4), lr=2e-3)
    step = make_train_step(model, noise_model="g", bank=bank)

    train_clean = jnp.asarray(_smooth_images(rng, 16))
    for i in range(300):
        sel = jax.random.choice(jax.random.PRNGKey(1000 + i), 16, (8,))
        state, m = step(state, {"clean": train_clean[sel]}, jax.random.PRNGKey(i))

    # held-out eval at a heavy noise level (noisy PSNR ~ 10 dB): a briefly
    # trained smoother must beat the identity decisively there
    holdout = jnp.asarray(_smooth_images(onp.random.default_rng(99), 4))
    p = NoiseParams(
        K=jnp.float32(2.0), g_scale=jnp.float32(25.0), G_scale=jnp.float32(1.0),
        G_shape=jnp.float32(0.1), R_scale=jnp.float32(1.0),
        color_bias=jnp.zeros(4), saturation_level=jnp.float32(15583.0),
        ratio=jnp.float32(200.0))
    from eld_tpu.noise.model import apply_noise

    fwd = make_eval_forward(model)
    gains = []
    for i in range(4):
        noisy = jnp.clip(apply_noise(jax.random.PRNGKey(50 + i), holdout[i], p, "g"), 0, 1)
        den = jnp.clip(fwd(state.params, noisy[None])[0], 0, 1)
        gains.append(float(psnr(den, holdout[i], 1.0)) - float(psnr(noisy, holdout[i], 1.0)))
    assert onp.mean(gains) > 1.0, f"PSNR gains {gains}"


@pytest.mark.slow
def test_xtrans_pipeline(rng, tmp_path):
    """9-channel X-Trans path: pack -> noise -> U-Net -> loss."""
    from eld_tpu.core.packing import pack_xtrans
    from eld_tpu.noise import sample_params_batch, synthesize

    mosaic = rng.random((96, 96), dtype=onp.float32)
    packed = pack_xtrans(mosaic)  # (32, 32, 9)
    assert packed.shape == (32, 32, 9)

    bank = load_camera_params(include=4)
    clean = jnp.asarray(onp.stack([packed, packed]))
    params = sample_params_batch(jax.random.PRNGKey(0), bank, 2)
    noisy = synthesize(jax.random.PRNGKey(1), clean, params, model="eld")
    assert noisy.shape == clean.shape

    model = build_arch("unet", 9, 9, base_width=4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 9))
    step = make_train_step(model, noise_model="pg", bank=bank)
    state, m = step(state, {"clean": clean}, jax.random.PRNGKey(2))
    assert onp.isfinite(float(m["Pixel"]))


@pytest.fixture
def sid_eval_tree(tmp_path, rng):
    """SID-layout tree covering the indoor15 protocol for one ratio-100
    pair (uses the real pair list name so the CLI path is exercised)."""
    from eld_tpu.data.pairs import eval_pairs_by_ratio

    pairs = eval_pairs_by_ratio()
    (tmp_path / "short").mkdir()
    (tmp_path / "long").mkdir()
    # synthesize files only for the first ratio-100 pair; return that subset
    short_fn, long_fn = pairs[100][0]
    gt = rng.integers(2048, 16384, (1048, 1048)).astype(onp.uint16)
    dark = (512 + (gt.astype(onp.float32) - 512) / 100).astype(onp.uint16)
    # CLI pair names end in .ARW; write DNG bytes under .npz rawpack names?
    # rawio dispatches on extension — write real TIFF bytes at the ARW name
    # (TIFF container, uncompressed — exactly what rawio parses).
    (tmp_path / "long" / long_fn).write_bytes(make_dng(gt, iso=100, exposure=10))
    (tmp_path / "short" / short_fn).write_bytes(make_dng(dark, iso=100, exposure=0.1))
    return str(tmp_path), [(short_fn, long_fn)]


def test_sid_eval_protocol(sid_eval_tree, tmp_path):
    """SIDDataset + Engine.eval: the full SID protocol (center 512 crop,
    illuminance correction) over a fixture pair."""
    from eld_tpu.config import Config
    from eld_tpu.data.datasets import SIDDataset
    from eld_tpu.data.loader import Loader
    from eld_tpu.train.engine import Engine

    root, pairs = sid_eval_tree
    cfg = Config(name="ev", checkpoints_dir=str(tmp_path / "ck"), is_train=False,
                 no_log=True, no_verbose=True, async_ckpt=False, base_width=8)
    engine = Engine(cfg)
    ds = SIDDataset(root, pairs, augment=False, memorize=False)
    loader = Loader(ds, batch_size=1, num_workers=0)
    res = engine.eval(loader, dataset_name="fixture", correct=True, crop=True)
    assert onp.isfinite(res["PSNR"]) and 0 <= res["SSIM"] <= 1


def test_eld_eval_cli(tmp_path, rng):
    """test_eld CLI end-to-end: fixture ELD tree + a saved checkpoint."""
    from eld_tpu.config import Config
    from eld_tpu.train.engine import Engine

    # checkpoint to resume from
    cfg = Config(name="cli_eld", checkpoints_dir=str(tmp_path / "ck"),
                 is_train=True, no_log=True, no_verbose=True, async_ckpt=False,
                 batch_size=1, mesh_data=1, base_width=8)
    Engine(cfg).save(label="latest")

    # ELD tree: one camera, 2 scenes, the full id protocol (inputs
    # 4,9,14 / 5,10,15 and their nearest GTs 6,11,16; DNG bytes at .CR2
    # names — rawio parses the TIFF container regardless of extension)
    base = tmp_path / "ELD"
    for scene in (1, 2):
        d = base / "CanonEOS70D" / f"scene-{scene}"
        d.mkdir(parents=True)
        gt = rng.integers(2048, 16384, (64, 64)).astype(onp.uint16)
        dark = (512 + (gt.astype(onp.float32) - 512) / 100).astype(onp.uint16)
        for gid in (6, 11, 16):
            (d / f"IMG_{gid:04d}.CR2").write_bytes(make_dng(gt, iso=800, exposure=1.0))
        for iid in (4, 9, 14, 5, 10, 15):
            (d / f"IMG_{iid:04d}.CR2").write_bytes(make_dng(dark, iso=800, exposure=0.01))

    from eld_tpu.tools import test_eld

    results = test_eld.main([
        "--datadir", str(base), "--scenes", "2", "--include", "1",
        "--name", "cli_eld", "--checkpoints_dir", str(tmp_path / "ck"),
        "--base_width", "8", "--no-log", "--no-verbose", "--resume",
    ])
    # x100 uses img id 4 (exists); all entries finite
    assert ("CanonEOS70D", "x100") in results
    assert onp.isfinite(results[("CanonEOS70D", "x100")]["PSNR"])


@pytest.mark.slow
def test_roofline_cli_static():
    """tools/roofline --no-run: static cost analysis only — reports
    FLOPs/bytes/intensity and the bandwidth floor without touching
    timing; sanity: the fused 512^2 step must be HBM-bound on v5e peaks
    (BASELINE.md roofline)."""
    from eld_tpu.tools.roofline import main

    rec = main(["--arch", "unet", "--batch", "1", "--patch", "64",
                "--no-run"])
    assert rec["flops_per_step"] > 0
    assert rec["bytes_per_step"] > 0
    assert rec["bound"] in ("hbm", "compute")
    assert rec["bw_floor_ms"] > 0
