"""One JAX process of a real 2-process CPU 'pod' for test_multiprocess.py.

Run as: python tests/_mp_child.py <process_id> <port> <workdir> <store>

Each process gets 2 virtual CPU devices (XLA_FLAGS set by the parent), so
the pod is 2 processes x 2 devices = 4 global devices — the smallest
topology where per-host loader sharding, cross-process batch assembly
(jax.make_array_from_process_local_data), collective orbax checkpointing,
and the host-0 eval broadcast are all genuinely multi-process.

Prints one machine-readable line: "RESULT <json>" with
  perm      global-batch position -> loader row (this process's shards)
  fp        sum of |params| after training (all leaves)
  losses    per-epoch Pixel means
  eval      broadcast eval meters (must be identical across processes)
  ckpts     checkpoint files present after training
  log_runs  number of TensorBoard run dirs (must stay 1: host 0 only)
"""

import json
import os
import sys


def main():
    pid, port, workdir, store_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from eld_tpu.parallel.multihost import host_shard, initialize_multihost

    shard = initialize_multihost(f"localhost:{port}", num_processes=2,
                                 process_id=pid)
    assert shard == (pid, 2), shard
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    import numpy as onp

    from eld_tpu.config import Config
    from eld_tpu.data.datasets import CleanPatchDataset
    from eld_tpu.data.loader import Loader
    from eld_tpu.data.patchstore import PatchStore
    from eld_tpu.parallel.mesh import shard_batch
    from eld_tpu.train.engine import Engine

    cfg = Config(
        name="mp", checkpoints_dir=os.path.join(workdir, "ckpt"),
        is_train=True, batch_size=8, mesh_data=4, noise="pg", include=4,
        no_log=False, no_verbose=True, n_threads=0, save_epoch_freq=1,
        async_ckpt=False, multihost=True, base_width=8,
    )
    engine = Engine(cfg)

    # Where do this process's loader rows land in the global batch?  The
    # loader hands process p rows p::world of each global batch; the mesh
    # assembly places each process's rows into ITS addressable shards.
    # Report the mapping so the parent can replay the exact same global
    # batch single-process (per-position noise keys depend on it).
    marker = onp.arange(8, dtype=onp.float32).reshape(8, 1, 1, 1) * onp.ones(
        (8, 4, 4, 4), onp.float32)
    g = shard_batch(engine.mesh, {"m": marker[pid::2]})["m"]
    perm = {}
    for s in g.addressable_shards:
        start = s.index[0].start or 0
        vals = onp.asarray(s.data)[:, 0, 0, 0]
        for off, v in enumerate(vals):
            perm[int(start + off)] = int(v)

    ds = CleanPatchDataset(PatchStore(store_path), augment=False)
    loader = Loader(ds, batch_size=8, shuffle=True, num_workers=0,
                    drop_last=True, shard=host_shard())

    losses = []
    for _ in range(3):
        meters = engine.train(loader)
        losses.append(meters["Pixel"])

    leaves = jax.tree_util.tree_leaves(jax.device_get(engine.state.params))
    fp = float(sum(onp.abs(l).sum() for l in leaves))

    # eval: host 0 runs the items, everyone gets the broadcast result and
    # enters the collective best-checkpoint save
    rng = onp.random.default_rng(5)
    item = {"input": rng.random((16, 16, 4), dtype=onp.float32),
            "target": rng.random((16, 16, 4), dtype=onp.float32)}
    res = engine.eval([item], dataset_name="mp_eval", loss_key="PSNR",
                      correct=True, crop=False)

    # scanned trainer on the pod: replicated pool, batch picks inside the
    # SPMD program, identical per-launch keys on every process (VERDICT r4
    # #4 — multi-host train_pool)
    from eld_tpu.data.loader import pool_to_device

    pool = {"clean": pool_to_device(PatchStore(store_path), engine.mesh)}
    scan_meters = engine.train_pool(pool, steps=4, steps_per_call=2)
    scan = {"Pixel": scan_meters["Pixel"],
            "PixelLast": scan_meters["PixelLast"]}
    leaves = jax.tree_util.tree_leaves(jax.device_get(engine.state.params))
    fp_scan = float(sum(onp.abs(l).sum() for l in leaves))

    logs = os.path.join(engine.cfg.save_dir, "logs")
    log_runs = len(os.listdir(logs)) if os.path.isdir(logs) else 0
    ckpts = sorted(f for f in os.listdir(engine.cfg.save_dir)
                   if f.endswith(".ckpt"))
    print("RESULT " + json.dumps({
        "pid": pid, "perm": perm, "fp": fp, "losses": losses,
        "eval": res.as_dict(), "ckpts": ckpts, "log_runs": log_runs,
        "save_dir": engine.cfg.save_dir,
        "scan": scan, "fp_scan": fp_scan,
    }), flush=True)


if __name__ == "__main__":
    main()
