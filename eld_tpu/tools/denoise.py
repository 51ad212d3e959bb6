"""Denoise raw files end to end — the serving CLI (no ground truth).

The eval tools (``test_sid``/``test_eld``) score against ground-truth
pairs; this is the deployment path: point it at raw files (any format
``data/rawio`` decodes: ARW/CR2/NEF/DNG/rawpack), give the amplification
ratio, and get denoised sRGB PNGs (and optionally the denoised packed
raw as ``.npz``).  The network comes from an orbax checkpoint, a
reference torch ``.pt`` state dict, or a baked ``.eldx`` serving
artifact (``eld_tpu.export``) — the artifact path needs no model flags
at all.  The reference has no inference-only entry point (its closest
is re-running ``test_SID.py`` with GT present).

Protocol notes:
  * input is black/white-normalized, packed, x ratio, clipped — exactly
    the eval-path preprocessing (``SIDDataset``, reference
    ``dataset/sid_dataset.py:403-410``);
  * ``--correct`` (default on) applies illuminance correction against
    the amplified INPUT (at inference there is no GT to correct
    against; disable with --no-correct for raw network output);
  * frames are edge-padded to the network's /16 alignment and cropped
    back, so any sensor geometry works.

Usage:
  python -m eld_tpu.tools.denoise --input ./short/ --ratio 100 \\
      --model_path model_best.pt --out ./denoised
  python -m eld_tpu.tools.denoise --input IMG_0004.ARW --ratio 200 \\
      --artifact sid_denoiser.eldx --out ./denoised --save_raw

Amplification comes from ``--ratio`` (fixed) or ``--target_exposure``
[+ ``--target_iso``] (per-file, derived from the input's own EXIF with
the ELD protocol's iso*expo arithmetic).  ``--batch N`` forwards
same-geometry frames together for throughput.

Serving is pipelined: raw decode/pack runs ahead of the device on a
bounded thread pool, and PNG/npz writes are handed to background
writers, so host IO overlaps device compute instead of serializing with
it (``--io_threads 0`` restores the fully synchronous path).  The
native decoder is handle-per-file with no global state, so parallel
decodes are safe (``native/rawio``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from concurrent.futures import ThreadPoolExecutor


RAW_EXTS = (".arw", ".cr2", ".nef", ".dng", ".tif", ".tiff", ".npz",
            ".rawpack")


def _list_inputs(path: str):
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.lower().endswith(RAW_EXTS))
        if not files:
            raise FileNotFoundError(f"{path}: no raw files ({RAW_EXTS})")
        return files
    return [path]


def _aligned_forward(fwd, x, base: int = 16, target=None):
    """Edge-pad H/W up to the network alignment (or to an explicit
    ``target`` geometry, e.g. an artifact's static dims), forward, crop
    back."""
    import jax.numpy as jnp

    _, h, w, _ = x.shape
    if target is not None:
        hp, wp = target
        if h > hp or w > wp:
            raise SystemExit(
                f"frame is {h}x{w} packed but the artifact was exported "
                f"for {hp}x{wp} — re-export with --height/--width "
                "(StableHLO spatial dims are static)")
    else:
        hp, wp = -(-h // base) * base, -(-w // base) * base
    if (hp, wp) != (h, w):
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                    mode="edge")
    return fwd(x)[:, :h, :w]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="raw file or directory of raw files")
    amp = p.add_mutually_exclusive_group(required=True)
    amp.add_argument("--ratio", type=float,
                     help="fixed amplification ratio "
                          "(target_expo/input_expo, e.g. 100 or 300)")
    amp.add_argument("--target_exposure", type=float,
                     help="derive each file's ratio from its own EXIF: "
                          "ratio = (target_iso * target_exposure) / "
                          "(iso * exposure) — the ELD protocol's "
                          "iso*expo arithmetic without a GT file")
    p.add_argument("--target_iso", type=float, default=100.0,
                   help="ISO paired with --target_exposure (default 100)")
    p.add_argument("--batch", type=int, default=1,
                   help="forward same-geometry frames together in "
                        "batches of this size (throughput; one XLA "
                        "program per distinct geometry)")
    p.add_argument("--io_threads", type=int, default=2,
                   help="host-IO pipelining: decode raw files ahead of "
                        "the device and write PNG/npz outputs in "
                        "background threads (this many of each). "
                        "Outputs are guaranteed on disk at the final "
                        "summary line; 0 = fully synchronous, minimal "
                        "memory (~2x batch frames are held while "
                        "pipelined)")
    p.add_argument("--out", required=True, help="output directory")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--model_path",
                     help="orbax .ckpt dir or reference torch .pt")
    src.add_argument("--artifact", help=".eldx serving artifact")
    p.add_argument("--arch", default="unet")
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--base_width", type=int, default=32)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--skip_mode", choices=["concat", "split"],
                   default="split",
                   help="decoder skip handling; 'split' (default) is an "
                        "exact re-parameterization of the same checkpoint; "
                        "with the default no-chop forward it measured "
                        "21.49 vs 19.12 full-frame fps on the real TPU "
                        "(+12.4%%, BASELINE.md round-5 serving sweep)")
    p.add_argument("--upsample", choices=["convt", "d2s"], default="convt")
    p.add_argument("--chop", action="store_true",
                   help="4-tile chopped forward (checkpoint path only; "
                        "artifacts bake their own chop choice)")
    p.add_argument("--no-correct", dest="correct", action="store_false",
                   help="skip illuminance correction against the input")
    p.add_argument("--crf", action="store_true",
                   help="render with the calibrated CRF instead of gamma")
    p.add_argument("--save_raw", action="store_true",
                   help="also write the denoised packed raw as .npz")
    ns = p.parse_args(argv)
    if ns.io_threads < 0:
        p.error("--io_threads must be >= 0")

    import jax
    import jax.numpy as jnp
    import numpy as onp

    from eld_tpu.core import isp
    from eld_tpu.data import rawio
    from eld_tpu.ops.correct import illuminance_correct
    from eld_tpu.utils.images import save_png

    os.makedirs(ns.out, exist_ok=True)

    pad_target = None
    base = 16
    if ns.artifact:
        from eld_tpu.export import load_denoiser

        baked = {"--chop": ns.chop, "--arch": ns.arch != "unet",
                 "--base_width": ns.base_width != 32, "--bf16": ns.bf16,
                 "--skip_mode": ns.skip_mode != "split",
                 "--upsample": ns.upsample != "convt"}
        wrong = [k for k, v in baked.items() if v]
        if wrong:
            p.error(f"{' '.join(wrong)}: model shape/arch flags are baked "
                    "at export time for artifacts — re-export instead")
        fwd, meta = load_denoiser(ns.artifact)
        pad_target = (meta["height"], meta["width"])
        if ns.batch > 1 and not meta.get("symbolic_batch", True):
            p.error("--batch > 1 needs a symbolic-batch artifact; this "
                    "one was exported with --static_batch (batch pinned "
                    "to 1)")
    else:
        from eld_tpu.models import build_arch
        from eld_tpu.train.steps import make_eval_forward

        dtype = jnp.bfloat16 if ns.bf16 else jnp.float32
        model = build_arch(ns.arch, ns.channels, ns.channels, dtype=dtype,
                           base_width=ns.base_width,
                           skip_mode=ns.skip_mode, upsample=ns.upsample)
        template = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, ns.channels), jnp.float32))["params"]
        if ns.model_path.endswith(".pt"):
            from eld_tpu.compat.torch_import import load_torch_checkpoint

            params, _, _ = load_torch_checkpoint(ns.model_path, template)
        else:
            from eld_tpu.train.checkpoints import restore_params

            params, _, _ = restore_params(ns.model_path, template)
        net = make_eval_forward(model, chop=ns.chop)
        fwd = lambda x: net(params, x)
        base = model.alignment() if hasattr(model, "alignment") else 16

    crf = None
    if ns.crf:
        from eld_tpu.core.emor import load_crf

        crf = load_crf()

    def ratio_for(path, raw) -> float:
        if ns.ratio is not None:
            return float(ns.ratio)
        denom = raw.iso * raw.exposure
        if denom <= 0:
            raise SystemExit(
                f"{path}: EXIF iso*exposure is {denom}; cannot derive the "
                "ratio for --target_exposure (use --ratio instead)")
        return (ns.target_iso * ns.target_exposure) / denom

    results = []
    used_names = set()
    writer = (ThreadPoolExecutor(max_workers=ns.io_threads)
              if ns.io_threads > 0 else None)
    writes = []

    def submit_write(fn, *a, **kw):
        if writer is None:
            fn(*a, **kw)
        else:
            writes.append(writer.submit(fn, *a, **kw))

    def out_path(path, suffix):
        """Collision-safe output name (IMG_0001.ARW next to IMG_0001.dng
        must not clobber each other)."""
        stem = os.path.splitext(os.path.basename(path))[0]
        name, n = f"{stem}_denoised{suffix}", 2
        while name in used_names:
            name = f"{stem}_denoised_{n}{suffix}"
            n += 1
        used_names.add(name)
        return os.path.join(ns.out, name)

    def serve(group):
        """Forward a same-geometry group in one call, then finish each
        frame (correction, ISP render, writes) individually."""
        xb = jnp.asarray(onp.stack([g["x"] for g in group]))
        preds = _aligned_forward(fwd, xb, base=base, target=pad_target)
        for i, (g, pred) in enumerate(zip(group, preds)):
            if ns.correct:
                # correct against the already-device-resident input row
                # (a second host->device upload of a full frame costs
                # seconds on a transfer-bound link)
                corrected = illuminance_correct(pred, xb[i])
                if bool(jnp.isfinite(corrected).all()):
                    pred = corrected
                else:
                    # every input pixel saturated -> empty correction
                    # mask (0/0); serve the uncorrected output, not NaNs
                    print(f"[w] {g['path']}: input fully saturated at "
                          f"ratio {g['ratio']:g}; skipping illuminance "
                          "correction", file=sys.stderr)
            pred = onp.clip(onp.asarray(pred, onp.float32), 0.0, 1.0)
            raw = g["raw"]
            rgb = onp.asarray(isp.raw2rgb(pred, raw.wb, raw.ccm, crf=crf))
            png = out_path(g["path"], ".png")
            submit_write(save_png, png, rgb * 255.0)
            rec = {"input": g["path"], "output": png, "ratio": g["ratio"]}
            if ns.save_raw:
                npz = out_path(g["path"], ".npz")
                submit_write(onp.savez_compressed, npz, packed=pred,
                             wb=raw.wb, ccm=raw.ccm)
                rec["raw_output"] = npz
            print(json.dumps(rec), file=sys.stderr)
            results.append(rec)

    def decode_one(path):
        """Host half of a frame: native decode, pack, amplify, clip —
        exactly the sequential preprocessing, hoisted onto the prefetch
        pool so it overlaps the previous group's device forward."""
        raw = rawio.imread(path)
        ratio = ratio_for(path, raw)
        x = onp.clip(raw.packed() * ratio, 0.0, 1.0)
        return {"path": path, "raw": raw, "x": x, "ratio": ratio}

    from eld_tpu.data.loader import prefetched_map

    try:
        window = max(2 * ns.batch, 2 * max(ns.io_threads, 1))
        pending = {}  # packed shape -> same-geometry frames awaiting a batch
        for g in prefetched_map(decode_one, _list_inputs(ns.input),
                                ns.io_threads, window):
            group = pending.setdefault(g["x"].shape, [])
            group.append(g)
            if len(group) >= ns.batch:
                serve(pending.pop(g["x"].shape))
        for shape in list(pending):
            serve(pending.pop(shape))
        for w in writes:
            w.result()  # surface write errors before declaring success
    finally:
        if writer is not None:
            writer.shutdown(wait=True)
    print(json.dumps({"count": len(results), "out": ns.out}))
    return results


def cli() -> int:
    """Console-script entry: discard main()'s return value (it is data
    for tests/importers, not an exit status — sys.exit(non-empty dict/
    list) would turn every success into exit code 1)."""
    main()
    return 0


if __name__ == "__main__":
    main()
