"""REAL multi-process pod test: 2 JAX processes, gloo CPU collectives.

The rest of the suite validates sharding on a single-process 8-device
virtual mesh; this spawns an actual 2-process jax.distributed cluster
(2 virtual CPU devices per process, 4 global) and drives the full Engine
stack through it — per-host loader shards, cross-process global batch
assembly, the fused noise+train step with a cross-process gradient psum,
collective orbax checkpointing, and the host-0 eval broadcast — then
replays the identical global batches in THIS process single-process and
asserts the trained parameters match.

The reference has no multi-node code at all (SURVEY.md §2); this is the
framework-level capability test the virtual mesh can't provide.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as onp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def mp_results(tmp_path_factory):
    """Run the 2-process pod once; individual tests assert on its record."""
    tmp = tmp_path_factory.mktemp("mp")
    from eld_tpu.data.patchstore import PatchStoreWriter

    store = str(tmp / "clean.eps")
    rng = onp.random.default_rng(2018)
    with PatchStoreWriter(store, (32, 32, 4), dtype=onp.uint16) as w:
        for _ in range(8):
            w.append(rng.integers(0, 65536, (32, 32, 4)).astype(onp.uint16),
                     wb=onp.array([2.0, 1.0, 1.5, 1.0]), ccm=onp.eye(3))

    port = _free_port()
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=2")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    child = os.path.join(REPO, "tests", "_mp_child.py")
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(pid), str(port), str(tmp), store],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    results = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out[-4000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"child {pid} printed no RESULT:\n{out[-4000:]}"
        results[pid] = json.loads(lines[-1][len("RESULT "):])
    return {"results": results, "store": store, "tmp": str(tmp)}


def test_two_process_cluster_trains_coherently(mp_results):
    """Both processes see the same global topology, agree on per-step
    losses, and end with identical parameters (replicated state)."""
    r0, r1 = mp_results["results"][0], mp_results["results"][1]
    assert r0["losses"] == pytest.approx(r1["losses"], rel=1e-6)
    assert r0["fp"] == pytest.approx(r1["fp"], rel=1e-6)
    # the scanned train_pool path is pod-coherent too (replicated pool,
    # picks inside the SPMD program)
    assert r0["scan"]["Pixel"] == pytest.approx(r1["scan"]["Pixel"], rel=1e-6)
    assert r0["fp_scan"] == pytest.approx(r1["fp_scan"], rel=1e-6)
    # loader rows from both hosts tile the global batch exactly
    perm = {int(k): v for k, v in {**r0["perm"], **r1["perm"]}.items()}
    assert sorted(perm) == list(range(8))
    assert sorted(perm.values()) == list(range(8))


def test_eval_broadcast_and_collective_best_save(mp_results):
    """Host 0 runs eval; every process returns the identical broadcast
    meters and enters the collective best-checkpoint save."""
    r0, r1 = mp_results["results"][0], mp_results["results"][1]
    assert r0["eval"] == r1["eval"]          # bitwise: same JSON payload
    assert r0["eval"]["PSNR"] > 0
    assert "model_best_PSNR_mp_eval.ckpt" in r0["ckpts"]


def test_process0_owns_logs_and_checkpoints_exist(mp_results):
    """Only process 0 created a TensorBoard run dir; the collective orbax
    saves produced exactly one coherent checkpoint set (no per-process
    duplicates)."""
    r0, r1 = mp_results["results"][0], mp_results["results"][1]
    assert r0["log_runs"] == r1["log_runs"] == 1
    assert "model_latest.ckpt" in r0["ckpts"]
    assert r0["ckpts"] == r1["ckpts"]  # shared dir, one checkpoint set


@pytest.mark.slow
def test_multiprocess_params_match_single_process(mp_results):
    """Replay the pod's exact global batches single-process; trained
    params must match the 2-process run (same data, same noise keys)."""
    import jax

    from eld_tpu.config import Config
    from eld_tpu.data.datasets import CleanPatchDataset
    from eld_tpu.data.patchstore import PatchStore
    from eld_tpu.train import checkpoints as ckpt
    from eld_tpu.train.engine import Engine

    r0, r1 = mp_results["results"][0], mp_results["results"][1]
    perm = {int(k): v for k, v in {**r0["perm"], **r1["perm"]}.items()}

    tmp = mp_results["tmp"]
    cfg = Config(
        name="sp", checkpoints_dir=os.path.join(tmp, "ckpt_sp"),
        is_train=True, batch_size=8, mesh_data=4, noise="pg", include=4,
        no_log=True, no_verbose=True, n_threads=0, save_epoch_freq=1,
        async_ckpt=False, base_width=8,
    )
    engine = Engine(cfg)
    ds = CleanPatchDataset(PatchStore(mp_results["store"]), augment=False)

    for epoch in range(3):
        # the children's Loader: shuffle permutation seeded 2018+epoch,
        # then global position j holds loader row perm[j] of that batch
        idxs = onp.random.default_rng(2018 + epoch).permutation(8)
        batch = onp.stack([ds[int(idxs[perm[j]])]["clean"] for j in range(8)])
        meters = engine.train([{"clean": batch}])
        assert meters["Pixel"] == pytest.approx(
            mp_results["results"][0]["losses"][epoch], rel=1e-4)

    # the pod continued with the scanned train_pool path; replay it with
    # the same pool/keys — picks happen inside the program, so the batch
    # stream is mesh-layout-independent
    from eld_tpu.data.loader import pool_to_device

    pool = {"clean": pool_to_device(PatchStore(mp_results["store"]),
                                    engine.mesh)}
    meters = engine.train_pool(pool, steps=4, steps_per_call=2)
    assert meters["Pixel"] == pytest.approx(r0["scan"]["Pixel"], rel=1e-4)
    assert meters["PixelLast"] == pytest.approx(
        r0["scan"]["PixelLast"], rel=1e-4)

    # leaf-wise parameter comparison against the pod's final checkpoint
    pod_latest = os.path.join(
        mp_results["results"][0]["save_dir"], "model_latest.ckpt")
    pod_state = ckpt.restore_checkpoint(pod_latest, engine.state)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(engine.state.params)),
                    jax.tree_util.tree_leaves(jax.device_get(pod_state.params))):
        onp.testing.assert_allclose(onp.asarray(a), onp.asarray(b),
                                    rtol=2e-4, atol=2e-5)
