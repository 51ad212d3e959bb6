"""END-TO-END protocol parity against the reference's *composed* eval stack.

The unit-level differential tests (``test_reference_diff.py``) diff every
stage in isolation; this module closes the remaining gap by running the
reference's own composed pipeline — ``SIDDataset -> DataLoader ->
ELDModel.eval`` (``/root/reference/test_SID.py:42-49`` ->
``engine.py:75-99`` -> ``models/ELD_model.py:203-307``) — and our
``tools/test_sid`` CLI on IDENTICAL inputs with the SAME torch checkpoint,
then asserts the final averaged PSNR/SSIM agree to +-0.05 dB / 1e-3.

Construction (no SID data is reachable in this environment):

  * Paired raws are synthesized as real uncompressed DNG files
    (``tests/tiff_fixture.make_dng``) with SID-style exposure-ratio
    filenames.  OUR stack decodes the actual DNG bytes through the native
    ``rawio`` decoder; the REFERENCE stack reads ground-truth sidecar
    ``.npz`` files through a ``rawpy`` stub exposing the rawpy field
    surface (``raw_image_visible``/``raw_pattern``/
    ``black_level_per_channel``/``camera_whitebalance``/
    ``rgb_camera_matrix``).  The two sides therefore share NO decode code:
    a native-decoder regression shows up as a final-metric divergence.
  * The checkpoint is a torch-default-init ``UNetSeeInDark`` saved in the
    reference's ``.pt`` layout ({'netG': state_dict, epoch, iterations},
    ``ELD_model.py:516-521``); the reference loads it natively, our Engine
    imports it through ``compat/torch_import.load_torch_checkpoint``.
  * ``skimage.metrics`` (absent in this image) is stubbed with an
    independent NumPy implementation of the published algorithms
    (uniform 7x7 SSIM with sample-covariance normalization, the exact
    scikit-image defaults the reference calls with ``multichannel=True``,
    ``util/index.py:76-81``) — so the metric backends differ between the
    two sides as well (ours is the JAX ``ops/metrics.py``).

Both the straight forward and the ``--chop`` (``forward_chop``) protocol
variants are covered, at the protocol's real crop geometry (512x512
center crop over 512x512 packed frames => identity crop, the same no-op
it is on full SID frames only at center).

The OTHER released protocol — ``test_ELD.py``'s ELDEvalDataset (nearest
ground truth of ids {1,6,11,16}, amplification ratio from EXIF iso*expo,
full-frame crop=False eval) — is composed-diffed the same way
(``test_composed_eld_protocol_parity``): our side derives the ratio from
the real DNG IFD EXIF tags through the native decoder, the reference
side from sidecars through an exifread stub, so EXIF parsing is
independent between the stacks too.
"""

import os
import sys
import types

import numpy as onp
import pytest

torch = pytest.importorskip("torch")
from scipy.ndimage import uniform_filter  # noqa: E402

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not mounted"
)


# ---------------------------------------------------------------------------
# independent skimage.metrics stand-ins (scikit-image published defaults)
# ---------------------------------------------------------------------------

def _psnr(image_true, image_test, data_range=None):
    err = onp.mean(
        (image_true.astype(onp.float64) - image_test.astype(onp.float64)) ** 2)
    return 10.0 * onp.log10((float(data_range) ** 2) / err)


def _ssim_single(x, y, data_range):
    """scikit-image structural_similarity, gaussian_weights=False defaults:
    win=7 uniform filter, K1=.01 K2=.03, sample covariance, border crop."""
    win = 7
    x = x.astype(onp.float64)
    y = y.astype(onp.float64)
    NP = win ** 2
    cov_norm = NP / (NP - 1.0)
    f = lambda a: uniform_filter(a, size=win)
    ux, uy = f(x), f(y)
    uxx, uyy, uxy = f(x * x), f(y * y), f(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    R = float(data_range)
    C1, C2 = (0.01 * R) ** 2, (0.03 * R) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    pad = (win - 1) // 2
    return S[pad:-pad, pad:-pad].mean()


def _ssim(im1, im2, data_range=None, multichannel=False, **kw):
    if multichannel:
        return float(onp.mean([
            _ssim_single(im1[..., c], im2[..., c], data_range)
            for c in range(im1.shape[-1])
        ]))
    return float(_ssim_single(im1, im2, data_range))


# ---------------------------------------------------------------------------
# stub modules + reference import
# ---------------------------------------------------------------------------

class _FakeRaw:
    """rawpy.imread stand-in reading the fixture's ground-truth sidecar."""

    def __init__(self, path):
        z = onp.load(path + ".npz")
        self.raw_image_visible = z["mosaic"].astype(onp.uint16)
        self.raw_pattern = z["pattern"].astype(onp.int64)
        self.black_level_per_channel = [int(v) for v in z["black"]]
        self.camera_whitebalance = z["wb"].astype(onp.float64).copy()
        # rawpy exposes (3, 4); read_wb_ccm slices [:3, :3]
        self.rgb_camera_matrix = onp.concatenate(
            [z["ccm"].astype(onp.float64), onp.zeros((3, 1))], axis=1)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _ExifTag:
    """exifread tag stand-in: the reference does ``eval(str(tag))``
    (sid_dataset.py:27-28), so str() must be the numeric literal."""

    def __init__(self, v):
        self._v = v

    def __str__(self):
        return repr(self._v)


def _exif_process_file(f):
    """exifread.process_file stand-in reading the fixture's ground-truth
    sidecar — the reference side never parses our DNG bytes, so the two
    stacks share no EXIF code either (ours decodes the real IFD tags)."""
    z = onp.load(f.name + ".npz")
    return {
        "Image ExposureTime": _ExifTag(float(z["expo"])),
        "Image ISOSpeedRatings": _ExifTag(int(z["iso"])),
    }


class _Interp1d:
    """torchinterp1d stand-in (absent in this image) — batched linear
    interpolation via searchsorted, same as test_reference_diff."""

    def __call__(self, x, y, xnew):
        x, y, xnew = x.double(), y.double(), xnew.double()
        ind = torch.searchsorted(x.contiguous(), xnew.contiguous()) - 1
        ind = torch.clamp(ind, 0, x.shape[-1] - 2)
        x0, x1 = x[..., :-1].gather(-1, ind), x[..., 1:].gather(-1, ind)
        y0, y1 = y[..., :-1].gather(-1, ind), y[..., 1:].gather(-1, ind)
        t = (xnew - x0) / torch.clamp(x1 - x0, min=1e-12)
        return y0 + t * (y1 - y0)


def _stub_module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


@pytest.fixture(scope="module")
def ref():
    """Import the reference's models/dataset packages with absent third-party
    deps stubbed; restore sys.modules/sys.path afterwards."""
    rawpy = _stub_module("rawpy", imread=_FakeRaw)
    skimage = _stub_module("skimage")
    skimage_metrics = _stub_module(
        "skimage.metrics",
        structural_similarity=_ssim,
        peak_signal_noise_ratio=_psnr,
    )
    skimage.metrics = skimage_metrics

    def _unavailable(*a, **k):
        raise RuntimeError("video metrics are not under test here")

    skvideo = _stub_module("skvideo")
    skvideo_measure = _stub_module("skvideo.measure", strred=_unavailable)
    skvideo_utils = _stub_module("skvideo.utils", rgb2gray=_unavailable)
    skvideo.measure, skvideo.utils = skvideo_measure, skvideo_utils
    exifread = _stub_module("exifread", process_file=_exif_process_file)
    tinterp = _stub_module("torchinterp1d", Interp1d=_Interp1d)
    lmdb = _stub_module("lmdb")

    stubs = {
        "rawpy": rawpy,
        "skimage": skimage,
        "skimage.metrics": skimage_metrics,
        "skvideo": skvideo,
        "skvideo.measure": skvideo_measure,
        "skvideo.utils": skvideo_utils,
        "exifread": exifread,
        "torchinterp1d": tinterp,
        "lmdb": lmdb,
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    ref_top = ("models", "util", "dataset", "options")
    saved_top = {k: sys.modules.get(k) for k in list(sys.modules)
                 if k.split(".")[0] in ref_top}
    for k in saved_top:
        del sys.modules[k]
    sys.modules.update(stubs)
    sys.path.insert(0, REFERENCE)

    # dataset/torchdata.py imports torch._utils._accumulate, removed in
    # modern torch — shim it with itertools.accumulate (same running sums).
    import itertools

    import torch._utils as _tu

    shimmed_accumulate = not hasattr(_tu, "_accumulate")
    if shimmed_accumulate:
        _tu._accumulate = lambda iterable, fn=None: itertools.accumulate(iterable)

    # util/util.py runs `os.popen('stty size')` at import time (line 185);
    # headless pytest has no tty, so feed it a fake terminal geometry.
    real_popen = os.popen
    os.popen = lambda *a, **k: __import__("io").StringIO("24 80\n")
    try:
        import dataset.sid_dataset as ref_sid
        import models.ELD_model as ref_eldm
    finally:
        os.popen = real_popen

    yield types.SimpleNamespace(sid=ref_sid, eldm=ref_eldm)

    sys.path.remove(REFERENCE)
    if shimmed_accumulate:
        del _tu._accumulate
    for k in list(sys.modules):
        if k.split(".")[0] in ref_top:
            del sys.modules[k]
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v
    for k, v in saved_top.items():
        sys.modules[k] = v


# ---------------------------------------------------------------------------
# fixture dataset: real DNG files + ground-truth sidecars
# ---------------------------------------------------------------------------

BLACK, WHITE = 512, 16383
PATTERN = onp.array([[0, 1], [3, 2]])          # R G1 / G2 B (rawpy codes)
OFFSETS = ((0, 0), (0, 1), (1, 1), (1, 0))     # (row,col) of R,G1,B,G2
WB = onp.array([2.0, 1.0, 1.0 / 0.6, 1.0])     # from AsShotNeutral (.5,1,.6)
# a plausible XYZ->cam ColorMatrix so the sRGB stage exercises a real CCM
CM = onp.array([[0.779, -0.083, 0.009],
                [-0.205, 1.016, 0.221],
                [0.020, 0.138, 0.595]])


def _smooth_scene(rng, n=512):
    yy, xx = onp.meshgrid(onp.linspace(0, 1, n), onp.linspace(0, 1, n),
                          indexing="ij")
    chans = []
    for _ in range(4):
        f1, f2 = rng.uniform(1.5, 4.0, 2)
        p1, p2 = rng.uniform(0.0, 6.28, 2)
        chans.append(0.5 + 0.35 * onp.sin(2 * onp.pi * f1 * xx + p1)
                     * onp.cos(2 * onp.pi * f2 * yy + p2))
    return onp.clip(onp.stack(chans, -1), 0.02, 0.98).astype(onp.float32)


def _mosaic(planes):
    h, w, _ = planes.shape
    m = onp.zeros((2 * h, 2 * w), onp.float32)
    for ch, (r, c) in enumerate(OFFSETS):
        m[r::2, c::2] = planes[..., ch]
    return onp.clip(onp.round(m * (WHITE - BLACK) + BLACK),
                    0, WHITE).astype(onp.uint16)


def _write_raw(dirpath, fn, mosaic, expo, iso=1600):
    from eld_tpu.data.rawio import ccm_from_colormatrix
    from tests.tiff_fixture import make_dng

    path = os.path.join(dirpath, fn)
    with open(path, "wb") as f:
        f.write(make_dng(mosaic, iso=iso, exposure=expo,
                         black=(BLACK,) * 4, white=WHITE,
                         cfa=(0, 1, 1, 2), wb_neutral=(0.5, 1.0, 0.6),
                         ccm=CM))
    # ground truth for the rawpy stub: the cam->sRGB matrix our decoder
    # derives from the tag's 1e-4-quantized rationals (the conversion
    # itself is unit-diffed in test_rawio.py); iso/expo feed the exifread
    # stub (the DNG stores them at 1e-4 rational quantization — pick
    # exposures exact at /10_000 so both sides see identical doubles)
    ccm = ccm_from_colormatrix(onp.round(CM * 10_000) / 10_000)
    onp.savez(path + ".npz", mosaic=mosaic, pattern=PATTERN,
              black=onp.full(4, BLACK), wb=WB, ccm=ccm,
              expo=onp.float64(expo), iso=onp.int64(iso))


@pytest.fixture(scope="module")
def sid_dir(tmp_path_factory):
    """SID-layout directory: 3 pairs at ratios 100/250/300 + pair list."""
    root = tmp_path_factory.mktemp("sid_fixture")
    os.makedirs(root / "short")
    os.makedirs(root / "long")
    rng = onp.random.default_rng(20260817)
    pairs = []
    for i, expo in enumerate(("0.1", "0.04", "0.033")):
        ratio = min(10.0 / float(expo), 300.0)
        scene = _smooth_scene(rng)
        noisy = scene / ratio + rng.normal(0.0, 0.004, scene.shape)
        long_fn = f"{10001 + i}_00_10s.dng"
        short_fn = f"{10001 + i}_00_{expo}s.dng"
        _write_raw(str(root / "long"), long_fn, _mosaic(scene), 10.0)
        _write_raw(str(root / "short"), short_fn,
                   _mosaic(noisy.astype(onp.float32)), float(expo))
        pairs.append((short_fn, long_fn, int(ratio)))
    listfile = root / "pairs.txt"
    listfile.write_text(
        "".join(f"{s} {l} {r}\n" for s, l, r in pairs))
    return types.SimpleNamespace(root=str(root), pairs=pairs,
                                 listfile=str(listfile))


@pytest.fixture(scope="module")
def eld_dir(tmp_path_factory):
    """ELD-layout directory (reference test_ELD.py): one camera dir with
    scene-1/IMG_XXXX.dng — GT long exposures at ids {1,6,11,16}
    (iso 100, 10 s) and noisy inputs at ids {4,9,14} (x100: iso 1000,
    1/100 s) and {5,10,15} (x200: iso 1000, 1/200 s).  The amplification
    ratio comes from EXIF iso*expo on BOTH sides (ours from the real DNG
    IFD tags, the reference from the sidecar through the exifread stub)."""
    root = tmp_path_factory.mktemp("eld_fixture")
    scene_dir = os.path.join(str(root), "SonyA7S2", "scene-1")
    os.makedirs(scene_dir)
    rng = onp.random.default_rng(20260818)
    scene = _smooth_scene(rng, n=256)
    for gt_id in (1, 6, 11, 16):
        _write_raw(scene_dir, f"IMG_{gt_id:04d}.dng", _mosaic(scene),
                   expo=10.0, iso=100)
    for img_id, ratio in ((4, 100.0), (9, 100.0), (14, 100.0),
                          (5, 200.0), (10, 200.0), (15, 200.0)):
        noisy = (scene / ratio
                 + rng.normal(0.0, 0.004, scene.shape)).astype(onp.float32)
        _write_raw(scene_dir, f"IMG_{img_id:04d}.dng", _mosaic(noisy),
                   expo=10.0 / ratio / 10.0, iso=1000)
    return str(root)


@pytest.fixture(scope="module")
def pt_checkpoint(tmp_path_factory, ref):
    """Reference-format .pt checkpoint from torch's own default init."""
    torch.manual_seed(7)
    import models.arch as ref_arch

    net = ref_arch.UNetSeeInDark(4, 4)
    path = tmp_path_factory.mktemp("ckpt") / "model_parity.pt"
    torch.save({"netG": net.state_dict(), "epoch": 0, "iterations": 0},
               str(path))
    return str(path)


# ---------------------------------------------------------------------------
# the two composed stacks
# ---------------------------------------------------------------------------

def _ref_eval(ref, sid_dir, pt_path, chop, stage_eval="raw"):
    """The reference's own composed protocol: test_SID.py:42-49 with
    engine.eval's accumulation loop inlined (engine.py:75-99)."""
    opt = types.SimpleNamespace(
        gpu_ids=[], isTrain=False, checkpoints_dir=sid_dir.root,
        name="ref_parity", netG="unet", channels=4,
        stage_in="raw", stage_out="raw", stage_eval=stage_eval,
        chop=chop, crf=False, resume=False, no_verbose=True,
        model_path=None, gt_wb=False,
    )
    model = ref.eldm.ELDModel()
    model.initialize(opt)
    state = torch.load(pt_path, map_location="cpu", weights_only=False)
    model.netG.load_state_dict(state["netG"])

    out = {}
    for short_fn, long_fn, ratio in sid_dir.pairs:
        ds = ref.sid.SIDDataset(
            sid_dir.root, [(short_fn, long_fn)], memorize=False, size=None,
            augment=False, stage_in="raw", stage_out="raw")
        loader = torch.utils.data.DataLoader(
            ds, batch_size=1, shuffle=False, num_workers=0)
        acc = []
        for data in loader:
            acc.append(model.eval(data, savedir=None, correct=True, crop=True))
        out[ratio] = {
            "PSNR": float(onp.mean([a["PSNR"] for a in acc])),
            "SSIM": float(onp.mean([a["SSIM"] for a in acc])),
        }
    return out


def _our_eval(sid_dir, pt_path, tmp, chop, stage_eval="raw"):
    """Our released CLI, end to end (tools/test_sid.main)."""
    from eld_tpu.tools.test_sid import main

    argv = [
        "--datadir", sid_dir.root, "--pairs", sid_dir.listfile,
        "--name", f"our_parity_{int(chop)}_{stage_eval}",
        "--checkpoints_dir", str(tmp),
        "--model_path", pt_path, "--mesh_data", "1",
        "--stage_eval", stage_eval,
        "--no-log", "--no-verbose",
    ]
    if chop:
        argv.append("--chop")
    return main(argv)


def _our_eval_ckpt(sid_dir, ckpt_path, tmp):
    """Our released CLI evaluating a native orbax checkpoint (the artifact
    a scanned training run actually produces)."""
    from eld_tpu.tools.test_sid import main

    return main([
        "--datadir", sid_dir.root, "--pairs", sid_dir.listfile,
        "--name", "our_scan_parity", "--checkpoints_dir", str(tmp),
        "--model_path", ckpt_path, "--mesh_data", "1",
        "--no-log", "--no-verbose",
    ])


def _ref_eld_eval(ref, eld_root, pt_path):
    """The reference's composed ELD protocol: test_ELD.py:33-51 —
    ELDEvalDataset (nearest-GT of {1,6,11,16}, EXIF iso*expo ratio) ->
    DataLoader -> ELDModel.eval(correct=True, crop=False)."""
    opt = types.SimpleNamespace(
        gpu_ids=[], isTrain=False, checkpoints_dir=eld_root,
        name="ref_eld_parity", netG="unet", channels=4,
        stage_in="raw", stage_out="raw", stage_eval="raw",
        chop=False, crf=False, resume=False, no_verbose=True,
        model_path=None, gt_wb=False,
    )
    model = ref.eldm.ELDModel()
    model.initialize(opt)
    state = torch.load(pt_path, map_location="cpu", weights_only=False)
    model.netG.load_state_dict(state["netG"])

    out = {}
    for level, img_ids in (("x100", [4, 9, 14]), ("x200", [5, 10, 15])):
        ds = ref.sid.ELDEvalDataset(eld_root, ("SonyA7S2", ".dng"),
                                    scenes=[1], img_ids=img_ids)
        loader = torch.utils.data.DataLoader(
            ds, batch_size=1, shuffle=False, num_workers=0)
        acc = []
        with torch.no_grad():
            for data in loader:
                acc.append(model.eval(data, savedir=None, correct=True,
                                      crop=False))
        out[level] = {
            "PSNR": float(onp.mean([a["PSNR"] for a in acc])),
            "SSIM": float(onp.mean([a["SSIM"] for a in acc])),
        }
    return out


def _our_eld_eval(eld_root, pt_path, tmp):
    """Our released CLI, end to end (tools/test_eld.main) — SonyA7S2 only
    (--include 4), fixture suffix .dng, both amplification levels."""
    from eld_tpu.tools.test_eld import main

    res = main([
        "--datadir", eld_root, "--scenes", "1", "--suffix", ".dng",
        "--include", "4", "--name", "our_eld_parity",
        "--checkpoints_dir", str(tmp),
        "--model_path", pt_path, "--mesh_data", "1",
        "--no-log", "--no-verbose",
    ])
    return {level: vals for (_cam, level), vals in res.items()}


# ---------------------------------------------------------------------------
# the parity assertions
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("chop,stage_eval", [
    (False, "raw"), (True, "raw"), (False, "srgb"),
], ids=["plain", "chop", "srgb"])
@pytest.mark.slow
def test_composed_eval_protocol_parity(ref, sid_dir, pt_checkpoint,
                                       tmp_path, chop, stage_eval):
    theirs = _ref_eval(ref, sid_dir, pt_checkpoint, chop, stage_eval)
    ours = _our_eval(sid_dir, pt_checkpoint, tmp_path, chop, stage_eval)

    assert set(theirs) == set(ours)
    for ratio in theirs:
        dpsnr = abs(theirs[ratio]["PSNR"] - ours[ratio]["PSNR"])
        dssim = abs(theirs[ratio]["SSIM"] - ours[ratio]["SSIM"])
        assert dpsnr <= 0.05, (
            f"ratio {ratio}: PSNR {ours[ratio]['PSNR']:.4f} vs reference "
            f"{theirs[ratio]['PSNR']:.4f} (|d|={dpsnr:.4f} dB)")
        assert dssim <= 1e-3, (
            f"ratio {ratio}: SSIM {ours[ratio]['SSIM']:.5f} vs reference "
            f"{theirs[ratio]['SSIM']:.5f} (|d|={dssim:.5f})")


@pytest.mark.slow
def test_scan_trained_checkpoint_composed_parity(ref, sid_dir, tmp_path):
    """A checkpoint trained via the scanned ``Engine.train_pool`` path is
    protocol-indistinguishable: our released CLI evals the orbax artifact
    the scan run saved, the reference's own composed stack evals the same
    weights exported to its ``.pt`` layout — final PSNR/SSIM agree to
    +-0.05 dB / 1e-3 (VERDICT r4 #6: the scan path previously had
    throughput and finite-loss evidence only)."""
    import jax

    from eld_tpu.compat.torch_import import export_torch_state_dict
    from eld_tpu.config import Config
    from eld_tpu.train.engine import Engine

    cfg = Config(
        name="scan_ckpt", checkpoints_dir=str(tmp_path / "train"),
        is_train=True, batch_size=4, mesh_data=1, noise="pg", include=4,
        no_log=True, no_verbose=True, async_ckpt=False, seed=11,
    )
    engine = Engine(cfg)
    pool = {"clean": jax.numpy.asarray(
        onp.random.default_rng(3).random((8, 64, 64, 4), onp.float32))}
    engine.train_pool(pool, steps=4, steps_per_call=2)
    engine.save(label="latest", wait=True)
    ckpt_path = os.path.join(cfg.save_dir, "model_latest.ckpt")
    assert os.path.exists(ckpt_path)

    # reference side: the SAME weights in the reference's own .pt layout
    sd = export_torch_state_dict(jax.device_get(engine.state.params))
    pt_path = str(tmp_path / "model_scan.pt")
    torch.save({"netG": {k: torch.from_numpy(onp.ascontiguousarray(v))
                         for k, v in sd.items()},
                "epoch": engine.epoch, "iterations": engine.iterations},
               pt_path)

    theirs = _ref_eval(ref, sid_dir, pt_path, chop=False)
    ours = _our_eval_ckpt(sid_dir, ckpt_path, tmp_path)

    assert set(theirs) == set(ours)
    for ratio in theirs:
        dpsnr = abs(theirs[ratio]["PSNR"] - ours[ratio]["PSNR"])
        dssim = abs(theirs[ratio]["SSIM"] - ours[ratio]["SSIM"])
        assert dpsnr <= 0.05, (
            f"ratio {ratio}: PSNR {ours[ratio]['PSNR']:.4f} vs reference "
            f"{theirs[ratio]['PSNR']:.4f} (|d|={dpsnr:.4f} dB)")
        assert dssim <= 1e-3, (
            f"ratio {ratio}: SSIM {ours[ratio]['SSIM']:.5f} vs reference "
            f"{theirs[ratio]['SSIM']:.5f} (|d|={dssim:.5f})")


def test_composed_eld_protocol_parity(ref, eld_dir, pt_checkpoint, tmp_path):
    """The OTHER released eval protocol (test_ELD.py): nearest-GT pairing,
    EXIF-derived amplification, full-frame (crop=False) corrected metrics —
    composed end to end on both stacks, +-0.05 dB / 1e-3."""
    theirs = _ref_eld_eval(ref, eld_dir, pt_checkpoint)
    ours = _our_eld_eval(eld_dir, pt_checkpoint, tmp_path)

    assert set(theirs) <= set(ours)
    for level in theirs:
        dpsnr = abs(theirs[level]["PSNR"] - ours[level]["PSNR"])
        dssim = abs(theirs[level]["SSIM"] - ours[level]["SSIM"])
        assert dpsnr <= 0.05, (
            f"{level}: PSNR {ours[level]['PSNR']:.4f} vs reference "
            f"{theirs[level]['PSNR']:.4f} (|d|={dpsnr:.4f} dB)")
        assert dssim <= 1e-3, (
            f"{level}: SSIM {ours[level]['SSIM']:.5f} vs reference "
            f"{theirs[level]['SSIM']:.5f} (|d|={dssim:.5f})")
