"""Dataset-building CLI — drives the builder recipes.

Parity with running ``util/lmdb_data.py`` in the reference.

Usage:
  python -m eld_tpu.tools.build_dataset clean  --sourcedir ./data/SID/Sony --destdir ./data/Train
  python -m eld_tpu.tools.build_dataset paired --sourcedir ./data/SID/Sony --destdir ./data/Train
  python -m eld_tpu.tools.build_dataset srgb   --sourcedir ./data/SID/Sony --destdir ./data/Train
  python -m eld_tpu.tools.build_dataset syn    --include 4 --noise g ...
"""

from __future__ import annotations

import argparse

from eld_tpu.data import builder


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("recipe", choices=["clean", "paired", "srgb", "syn"])
    p.add_argument("--sourcedir", type=str, default="./data/SID/Sony")
    p.add_argument("--destdir", type=str, default="./data/Train")
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--patch", type=int, default=512)
    p.add_argument("--stride", type=int, default=512)
    p.add_argument("--include", type=int, default=4)
    p.add_argument("--noise", type=str, default="g")
    p.add_argument("--no-crf", dest="crf", action="store_false")
    ns = p.parse_args(argv)

    if ns.recipe == "clean":
        builder.create_sony_dataset(ns.sourcedir, ns.destdir, ns.num_samples,
                                    patch=ns.patch, stride=ns.stride)
    elif ns.recipe == "paired":
        builder.create_sony_dataset_paired(ns.sourcedir, ns.destdir, ns.num_samples)
    elif ns.recipe == "srgb":
        builder.create_sony_dataset_srgb(ns.sourcedir, ns.destdir, ns.num_samples, ns.crf)
    elif ns.recipe == "syn":
        builder.create_sony_syn_dataset(ns.sourcedir, ns.destdir, ns.include,
                                        ns.noise, ns.num_samples)


def cli() -> int:
    """Console-script entry: discard main()'s return value (it is data
    for tests/importers, not an exit status — sys.exit(non-empty dict/
    list) would turn every success into exit code 1)."""
    main()
    return 0


if __name__ == "__main__":
    main()
