"""Convert camera raws to .npz rawpacks the native decoder can't parse.

Vendor-compressed formats (Sony ARW 2.3 lossy, Canon CR2 lossless JPEG)
need a one-time conversion on any machine with rawpy/LibRaw installed;
the output rawpacks feed every eld_tpu pipeline afterwards.  This tool
runs THERE, not on the TPU host (rawpy is not part of this environment).

Usage (machine with rawpy):
  python -m eld_tpu.tools.convert_raw ./data/SID/Sony/**/*.ARW --outdir ./data/rawpacks
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as onp

from eld_tpu.data.rawio import RawFile, save_rawpack


def convert_one(path: str, outdir: str) -> str:
    import rawpy  # only available off-TPU; see module docstring

    iso, expo = 100.0, 1.0
    try:
        import exifread

        with open(path, "rb") as f:
            tags = exifread.process_file(f)
        expo = float(eval(str(tags.get("EXIF ExposureTime", "1"))))  # noqa: S307
        iso = float(eval(str(tags.get("EXIF ISOSpeedRatings", "100"))))  # noqa: S307
    except Exception:
        pass

    with rawpy.imread(path) as raw:
        pattern = onp.asarray(raw.raw_pattern, onp.uint8)
        wb = onp.asarray(raw.camera_whitebalance, onp.float32)
        try:
            ccm = onp.asarray(raw.rgb_camera_matrix, onp.float32)[:3, :3]
        except AttributeError:
            ccm = onp.asarray(raw.color_matrix, onp.float32)[:3, :3]
        rf = RawFile(
            mosaic=onp.asarray(raw.raw_image_visible, onp.uint16),
            black_level=onp.asarray(raw.black_level_per_channel, onp.float32),
            white_level=float(raw.white_level),
            cfa_pattern=pattern,
            wb=wb,
            ccm=ccm,
            iso=iso,
            exposure=expo,
        )
    out = os.path.join(outdir, os.path.splitext(os.path.basename(path))[0] + ".npz")
    save_rawpack(out, rf)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("patterns", nargs="+")
    p.add_argument("--outdir", type=str, required=True)
    ns = p.parse_args(argv)
    os.makedirs(ns.outdir, exist_ok=True)
    fns = sorted(set(sum((glob.glob(pat, recursive=True) for pat in ns.patterns), [])))
    for i, fn in enumerate(fns):
        out = convert_one(fn, ns.outdir)
        print(f"({i + 1}/{len(fns)}) {fn} -> {out}")


def cli() -> int:
    """Console-script entry: discard main()'s return value (it is data
    for tests/importers, not an exit status — sys.exit(non-empty dict/
    list) would turn every success into exit code 1)."""
    main()
    return 0


if __name__ == "__main__":
    main()
