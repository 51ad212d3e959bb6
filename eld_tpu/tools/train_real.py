"""Paired real-data training CLI (reference ``train_real.py`` parity):
input and target both come from pre-packed patch stores (input already
x ratio at pack time), no noise model anywhere, same LR schedule.

Usage:
  python -m eld_tpu.tools.train_real --name sid_paired --traindir ./data/Train -b 8
"""

from __future__ import annotations

import sys
from os.path import join

import numpy as onp

from eld_tpu import config as config_mod
from eld_tpu.data.datasets import ELDTrainDataset, SIDDataset
from eld_tpu.data.loader import Loader
from eld_tpu.data.pairs import eval_pairs_by_ratio
from eld_tpu.data.patchstore import PatchStore
from eld_tpu.train.engine import Engine


def _store_name(stage: str, crf: bool, side: str) -> str:
    if stage == "srgb":
        return f"SID_Sony_{side}_SRGB_CRF.eps" if crf else f"SID_Sony_{side}_SRGB.eps"
    return f"SID_Sony_{side}_Raw.eps"


def main(argv=None):
    import argparse

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--traindir", type=str, default="./data/Train")
    pre.add_argument("--evaldir", type=str, default="./data/SID/Sony")
    pre.add_argument("--epochs", type=int, default=200)
    pre.add_argument("--eval_every", type=int, default=20)
    ns, rest = pre.parse_known_args(argv)
    cfg = config_mod.parse(rest, train=True)
    cfg.noise = ""  # paired mode

    from eld_tpu.parallel.multihost import maybe_initialize_multihost

    shard = maybe_initialize_multihost(cfg)

    input_store = PatchStore(join(ns.traindir, _store_name(cfg.stage_in, cfg.crf, "input")))
    target_store = PatchStore(join(ns.traindir, _store_name(cfg.stage_out, cfg.crf, "target")))
    train_ds = ELDTrainDataset(target_store, [input_store],
                               rng=onp.random.default_rng(cfg.seed))
    train_loader = Loader(train_ds, batch_size=cfg.batch_size, shuffle=True,
                          num_workers=cfg.n_threads, seed=cfg.seed, drop_last=True,
                          shard=shard)

    eval_loaders = {}
    try:
        pairs = eval_pairs_by_ratio()
        for ratio in (100, 300):
            crf = None
            if cfg.crf:
                from eld_tpu.core.emor import load_crf

                crf = load_crf()
            ds = SIDDataset(ns.evaldir, pairs[ratio], augment=False, memorize=False,
                            stage_in=cfg.stage_in, stage_out=cfg.stage_out,
                            gt_wb=cfg.gt_wb, crf=crf,
                            rng=onp.random.default_rng(cfg.seed))
            eval_loaders[ratio] = Loader(ds, batch_size=1, num_workers=0)
    except Exception as e:
        print(f"[i] eval datasets unavailable: {e}", file=sys.stderr)
    # collective decision: see train_syn (one host skipping eval would
    # hang the others in the merge collective)
    from eld_tpu.parallel.multihost import all_hosts_agree

    # both ratios or nothing — see train_syn
    if not all_hosts_agree(set(eval_loaders) == {100, 300}) and eval_loaders:
        print("[w] eval disabled: not every pod host has both eval "
              "ratios", file=sys.stderr)
        eval_loaders = {}

    from eld_tpu.tools.train_syn import lr_for_epoch

    engine = Engine(cfg)
    while engine.epoch < ns.epochs:
        engine.set_learning_rate(lr_for_epoch(engine.epoch))
        engine.train(train_loader)
        train_ds.reset()
        if engine.epoch % ns.eval_every == 0 and eval_loaders:
            try:
                engine.eval(eval_loaders[100], dataset_name="sid_eval_100", correct=True)
                engine.eval(eval_loaders[300], dataset_name="sid_eval_300", correct=True)
            except Exception as e:
                import jax

                if jax.process_count() > 1:
                    raise  # divergent control flow is unsafe on a pod
                print(f"[w] eval failed: {e}", file=sys.stderr)
    return engine


def cli() -> int:
    """Console-script entry: discard main()'s return value (it is data
    for tests/importers, not an exit status — sys.exit(non-empty dict/
    list) would turn every success into exit code 1)."""
    main()
    return 0


if __name__ == "__main__":
    main()
