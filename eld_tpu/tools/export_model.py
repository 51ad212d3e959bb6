"""Export a trained denoiser to a self-contained serving artifact.

Produces a ``.eldx`` StableHLO artifact (see ``eld_tpu.export``) from an
orbax checkpoint (``model_*.ckpt``) or a reference torch ``.pt`` state
dict — the deployment path the reference lacks (it serves by re-running
``models/ELD_model.py`` with the repo + torch on the box).

Usage:
  python -m eld_tpu.tools.export_model --arch unet \\
      --model_path checkpoints/sid_eld/model_latest.ckpt \\
      --height 1424 --width 2128 --chop --out sid_denoiser.eldx
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", type=str, default="unet")
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--out_channels", type=int, default=None)
    p.add_argument("--base_width", type=int, default=32,
                   help="U-Net level-0 width (must match the checkpoint)")
    p.add_argument("--model_path", type=str, required=True,
                   help="orbax .ckpt dir or reference torch .pt state dict")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--chop", action="store_true",
                   help="bake the reference 4-tile chopped forward in")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute inside the artifact (params stay f32)")
    p.add_argument("--skip_mode", choices=["concat", "split"],
                   default="split",
                   help="'split' (default; exact re-parameterization, same "
                        "checkpoint) measured +12.3%% full-frame fps on the "
                        "real TPU vs 'concat' — see BASELINE.md round-4 sweep")
    p.add_argument("--upsample", choices=["convt", "d2s"], default="convt")
    p.add_argument("--platforms", type=str, default="tpu,cpu")
    p.add_argument("--static_batch", action="store_true",
                   help="export with batch pinned to 1 instead of symbolic")
    p.add_argument("--quantize", choices=["int8"], default=None,
                   help="weight-only per-channel int8 constants with "
                        "in-graph dequantize (~4x smaller artifact)")
    p.add_argument("--out", type=str, required=True)
    ns = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from eld_tpu.export import save_denoiser
    from eld_tpu.models import build_arch

    out_ch = ns.out_channels if ns.out_channels is not None else ns.channels
    dtype = jnp.bfloat16 if ns.bf16 else jnp.float32
    model = build_arch(ns.arch, ns.channels, out_ch, dtype=dtype,
                       base_width=ns.base_width,
                       skip_mode=ns.skip_mode, upsample=ns.upsample)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, ns.channels), jnp.float32)
    )["params"]

    if ns.model_path.endswith(".pt"):
        from eld_tpu.compat.torch_import import load_torch_checkpoint

        params, epoch, iters = load_torch_checkpoint(ns.model_path, template)
    else:
        from eld_tpu.train.checkpoints import restore_params

        params, epoch, iters = restore_params(ns.model_path, template)

    meta = save_denoiser(
        ns.out, model, params, ns.height, ns.width, ns.channels,
        chop=ns.chop,
        platforms=tuple(s for s in ns.platforms.split(",") if s),
        symbolic_batch=not ns.static_batch,
        quantize=ns.quantize,
        extra_meta={"arch": ns.arch, "source": ns.model_path,
                    "epoch": epoch, "iterations": iters},
    )
    print(json.dumps(meta), file=sys.stderr)
    print(ns.out)
    return meta


def cli() -> int:
    """Console-script entry: discard main()'s return value (it is data
    for tests/importers, not an exit status — sys.exit(non-empty dict/
    list) would turn every success into exit code 1)."""
    main()
    return 0


if __name__ == "__main__":
    main()
