"""Synthetic-noise training CLI — the flagship entry point.

Parity surface with the reference's ``train_syn.py`` (flags, LR schedule
1e-4 -> 5e-5@100 -> 1e-5@180 over 200 epochs, eval on the 15-indoor-scene
SID subsets every 20 epochs), with the TPU-first difference that noise is
synthesized ON DEVICE inside the jitted train step by default — the
loader only streams clean patches.  ``--offline_noise`` reproduces the
reference's pre-baked-noise mode (0.1-0.3 dB worse per
``scripts/train.sh``) from a ``SID_Sony_syn_Raw_<cam>.eps`` store.

Usage:
  python -m eld_tpu.tools.train_syn --name sid_eld --noise eld --include 4 \
      --traindir ./data/Train --evaldir ./data/SID/Sony -b 8
"""

from __future__ import annotations

import sys
from os.path import join

import numpy as onp

from eld_tpu import config as config_mod
from eld_tpu.data.datasets import CleanPatchDataset, ELDTrainDataset, SIDDataset
from eld_tpu.data.loader import Loader
from eld_tpu.data.pairs import eval_pairs_by_ratio
from eld_tpu.data.patchstore import PatchStore
from eld_tpu.noise.params import CAMERA_NAMES
from eld_tpu.train.engine import Engine


def lr_for_epoch(epoch: int) -> float:
    """The reference schedule (train_syn.py:99-105), stated as a function
    of the epoch so resumed runs land on the right rate."""
    if epoch < 100:
        return 1e-4
    if epoch < 180:
        return 5e-5
    return 1e-5


def main(argv=None, extra=None):
    import argparse

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--traindir", type=str, default="./data/Train")
    pre.add_argument("--evaldir", type=str, default="./data/SID/Sony")
    pre.add_argument("--epochs", type=int, default=200)
    pre.add_argument("--offline_noise", action="store_true")
    pre.add_argument("--eval_every", type=int, default=20)
    pre.add_argument("--scan", type=int, default=-1, metavar="K",
                     help="keep the whole clean set in HBM and run K "
                          "optimizer steps per XLA launch (zero host "
                          "round-trips; train.steps.make_train_scan).  "
                          "Default -1 = auto: scan 10 when the pool fits "
                          "the HBM budget, else the per-step loader.  The "
                          "round-5 paired quality A/B measured the scan "
                          "path statistically indistinguishable from "
                          "epoch-permutation loading (+0.10 dB mean paired "
                          "delta) at 10.5%% less wall-clock (BASELINE.md); "
                          "--scan 0 forces the per-step loader (exact "
                          "reference sampling semantics)")
    ns, rest = pre.parse_known_args(argv)
    cfg = config_mod.parse(rest, train=True)

    from eld_tpu.parallel.multihost import maybe_initialize_multihost

    shard = maybe_initialize_multihost(cfg)

    if cfg.stage_in == "srgb" or cfg.stage_out == "srgb":
        store = PatchStore(join(ns.traindir, "SID_Sony_SRGB_CRF.eps"
                                if cfg.crf else "SID_Sony_SRGB.eps"),
                           size=cfg.max_dataset_size)
        train_ds = CleanPatchDataset(store, rng=onp.random.default_rng(cfg.seed))
    elif ns.offline_noise:
        camera = CAMERA_NAMES[4 if cfg.include is None else cfg.include]
        target = PatchStore(join(ns.traindir, "SID_Sony_Raw.eps"),
                            size=cfg.max_dataset_size)
        noisy = PatchStore(join(ns.traindir, f"SID_Sony_syn_Raw_{camera}.eps"),
                           size=cfg.max_dataset_size)
        train_ds = ELDTrainDataset(target, [noisy], rng=onp.random.default_rng(cfg.seed))
        cfg.noise = ""  # paired mode: noise already baked in
    else:
        store = PatchStore(join(ns.traindir, "SID_Sony_Raw.eps"),
                           size=cfg.max_dataset_size)
        # raw uint16 to the device; normalization happens in the train step
        train_ds = CleanPatchDataset(store, device_normalize=True,
                                     rng=onp.random.default_rng(cfg.seed))

    train_loader = Loader(train_ds, batch_size=cfg.batch_size, shuffle=True,
                          num_workers=cfg.n_threads, seed=cfg.seed, drop_last=True,
                          shard=shard)

    crf = None
    if cfg.crf:
        from eld_tpu.core.emor import load_crf

        crf = load_crf()
    eval_loaders = {}
    try:
        pairs = eval_pairs_by_ratio()
        for ratio in (100, 300):
            ds = SIDDataset(ns.evaldir, pairs[ratio], augment=False, memorize=False,
                            stage_in=cfg.stage_in, stage_out=cfg.stage_out,
                            gt_wb=cfg.gt_wb, crf=crf,
                            rng=onp.random.default_rng(cfg.seed))
            eval_loaders[ratio] = Loader(ds, batch_size=1, num_workers=0)
    except Exception as e:  # eval data optional during training
        print(f"[i] eval datasets unavailable: {e}", file=sys.stderr)
    # pods: the periodic eval enters collectives, so whether it runs must
    # be decided identically on every host (one host missing the eval
    # data would otherwise hang the others in the merge collective)
    from eld_tpu.parallel.multihost import all_hosts_agree

    # gate on BOTH ratios being built — a partial dict would pass a bool
    # gate, then KeyError at eval_loaders[300] mid-protocol (and on pods,
    # hang the intact hosts in the merge collective)
    if not all_hosts_agree(set(eval_loaders) == {100, 300}) and eval_loaders:
        print("[w] eval disabled: not every pod host has both eval "
              "ratios", file=sys.stderr)
        eval_loaders = {}

    engine = Engine(cfg)
    print(f"[i] using noise model {cfg.noise!r} (on-device)" if cfg.noise
          else "[i] paired mode (pre-baked noise)")

    if ns.scan < 0:
        # auto (default): scan 10 — the round-5 paired A/B measured it
        # quality-indistinguishable from the per-step loader at 10.5% less
        # wall (BASELINE.md "scanned-trainer quality gate") — but only on
        # the raw-domain path and only when the uint16 pool fits the HBM
        # budget next to the step's working set (v5e: 16 GB; the 512^2
        # batch-16 step needs ~4 GB temp).
        budget = 8e9
        stores = [noisy, target] if ns.offline_noise else [store]
        pool_bytes = sum(len(s) * int(onp.prod(s.shape))
                         * onp.dtype(s.dtype).itemsize for s in stores)
        if cfg.stage_in == "srgb" or cfg.stage_out == "srgb":
            ns.scan = 0  # sRGB stages keep the loader's ISP semantics
        elif pool_bytes > budget:
            print(f"[i] clean pool is {pool_bytes / 1e9:.1f} GB > "
                  f"{budget / 1e9:.0f} GB HBM budget; using the per-step "
                  "loader (pass --scan K to override)", file=sys.stderr)
            ns.scan = 0
        else:
            ns.scan = 10

    pool = None
    if ns.scan > 0:
        # pods included: the pool rides replicated and the batch picks run
        # inside the SPMD program (Engine.train_pool docstring) — every
        # host just needs the full store locally, like DataLoader workers
        from eld_tpu.data.loader import pool_to_device

        if ns.offline_noise:
            # stores already virtualize --max_dataset_size
            pool = {"input": pool_to_device(noisy, engine.mesh),
                    "target": pool_to_device(target, engine.mesh)}
        else:
            pool = {"clean": pool_to_device(store, engine.mesh)}
        steps_per_epoch = max(1, len(train_ds) // cfg.batch_size)

    while engine.epoch < ns.epochs:
        engine.set_learning_rate(lr_for_epoch(engine.epoch))
        if pool is not None:
            engine.train_pool(pool, steps_per_epoch, steps_per_call=ns.scan)
        else:
            engine.train(train_loader)
        if engine.epoch % ns.eval_every == 0 and eval_loaders:
            try:
                engine.eval(eval_loaders[100], dataset_name="sid_eval_100", correct=True)
                engine.eval(eval_loaders[300], dataset_name="sid_eval_300", correct=True)
            except Exception as e:
                import jax

                if jax.process_count() > 1:
                    # a pod cannot safely continue after divergent control
                    # flow inside a collective section
                    raise
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
