"""Offline AOT compilation against real TPU topology models (tools/aot.py).

The PJRT TPU compiler ships hardware models for named topologies, so the
framework's jitted programs can be compiled for an actual v5e — cost and
memory analysis included — with no TPU attached.  These tests pin down
that both deployment shapes stay compilable for the real backend:

  * the single-chip fused train step (bench.py's workload), and
  * the full 8-chip data-parallel step (shard_map'd Pallas noise kernel +
    XLA gradient all-reduce), i.e. the program ``dryrun_multichip``
    executes on the virtual CPU mesh, now type-checked against the
    hardware the CPU simulation stands in for.

The reference has no analog (no AOT, no cost model — its closest is the
parameter-count printout, ``models/networks.py:103-110``).
"""

import jax
import jax.numpy as jnp
import pytest

from eld_tpu.tools import aot


def _topologies_available() -> bool:
    try:
        return len(aot.topology_devices("v5e:2x2")) == 4
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _topologies_available(),
    reason="PJRT TPU compiler topology models unavailable in this image")


def _tiny_train_setup(mesh=None, batch=8):
    from eld_tpu.models import build_arch
    from eld_tpu.noise import load_camera_params
    from eld_tpu.train import create_train_state, make_train_step

    model = build_arch("unet", 4, 4, base_width=4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 4))
    bank = load_camera_params()
    # noise_impl pinned to "pallas" so the AOT path keeps compile-covering
    # the fused kernel ('auto' = jnp since the round-5 gate re-measurement)
    step = make_train_step(model, noise_model="eld", bank=bank, mesh=mesh,
                           noise_impl="pallas")
    clean = jax.ShapeDtypeStruct((batch, 64, 64, 4), jnp.float32)
    return state, step, {"clean": clean}


def test_single_chip_train_step_compiles_for_v5e():
    state, step, data = _tiny_train_setup()
    compiled = aot.compile_for(step, state, data, jax.random.PRNGKey(0),
                               topology="v5e:2x2")
    rec = aot.cost_record(compiled)
    assert rec["flops_per_step"] > 0
    assert rec["bytes_per_step"] > 0
    assert rec["hbm_temp_bytes"] > 0
    # the Pallas noise kernel survived TPU lowering inside the step
    assert "custom-call" in compiled.as_text()


def test_mesh8_train_step_compiles_for_v5e_2x4():
    from eld_tpu.parallel.mesh import (MeshSpec, batch_sharding, make_mesh,
                                       replicated)

    mesh = make_mesh(MeshSpec(data=8),
                     devices=aot.topology_devices("v5e:2x4"))
    state, step, data = _tiny_train_setup(mesh=mesh, batch=8)
    abstract = (aot.abstractify(state, replicated(mesh)),
                {"clean": aot.abstractify(data["clean"],
                                          batch_sharding(mesh))},
                aot.abstractify(jax.random.PRNGKey(0), replicated(mesh)))
    compiled = step.lower(*abstract).compile()
    hlo = compiled.as_text()
    # XLA inserted the gradient reduction collective over the 8 chips
    assert "all-reduce" in hlo
    rec = aot.cost_record(compiled)
    assert rec["flops_per_step"] > 0 and rec["bytes_per_step"] > 0
    # the ICI traffic accountant sees it: at least the f32 gradient
    # payload (one all-reduce per fused gradient bucket)
    coll = aot.collective_bytes(hlo)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    assert coll["collective_ops"] >= 1
    assert coll["collective_bytes"] >= n_params * 4


def test_remove_stale_libtpu_lock(tmp_path):
    """The lock breaker removes an UNHELD lockfile but never one a live
    process holds (flock staleness check) — breaking a live client's
    lock would let two claimants race the chip."""
    import fcntl
    import os
    import subprocess
    import sys

    stale = str(tmp_path / "stale_lock")
    open(stale, "w").close()
    assert aot.remove_stale_libtpu_lock(stale) is True
    assert not os.path.exists(stale)

    held = str(tmp_path / "held_lock")
    open(held, "w").close()
    holder = subprocess.Popen(
        [sys.executable, "-c",
         "import fcntl, sys, time\n"
         f"fd = open({held!r}, 'r+')\n"
         "fcntl.flock(fd, fcntl.LOCK_EX)\n"
         "print('locked', flush=True)\n"
         "time.sleep(60)\n"],
        stdout=subprocess.PIPE, text=True)
    try:
        assert holder.stdout.readline().strip() == "locked"
        assert aot.remove_stale_libtpu_lock(held) is False
        assert os.path.exists(held)
    finally:
        holder.kill()
        holder.wait()

    assert aot.remove_stale_libtpu_lock(str(tmp_path / "gone")) is False


def test_collective_bytes_parsing():
    """Pure HLO-text accounting: sync ops sum tuple components (fused
    all-reduce = all payload), async -start forms count only the largest
    (the tuple carries the operand alias), all-to-all is seen, -done
    echoes are skipped."""
    hlo = "\n".join([
        "  %ar = f32[1000]{0} all-reduce(f32[1000]{0} %g), replica_groups={}",
        "  %fused = (f32[100]{0}, f32[300]{0}) all-reduce(%a, %b)",
        "  %ags = (f32[128]{0}, f32[1024]{0}) all-gather-start(f32[128]{0} %x)",
        "  %agd = f32[1024]{0} all-gather-done((f32[128], f32[1024]) %ags)",
        "  %a2a = bf16[512]{0} all-to-all(bf16[512]{0} %y)",
        "  %noise = f32[64]{0} add(f32[64]{0} %p, f32[64]{0} %q)",
    ])
    rec = aot.collective_bytes(hlo)
    assert rec["collective_ops"] == 4
    assert rec["collective_bytes"] == (
        1000 * 4 + (100 + 300) * 4 + 1024 * 4 + 512 * 2)


@pytest.mark.slow
def test_spatial_eval_record_compiles_for_v5e():
    """The spatially-sharded full-frame eval compiles for real v5e chips;
    with a replicated input and the output left sharded it needs ZERO
    ICI collectives — each chip slices its own halo window locally."""
    rec = aot.eval_spatial_record(topology="v5e:2x2", spatial=4,
                                  h=128, w=192)
    assert rec["flops_per_step"] > 0 and rec["bytes_per_step"] > 0
    assert rec["collective_ops"] == 0
    # cost_analysis() on an SPMD program is PER-DEVICE: each chip runs
    # one halo window of win = slab + 2*halo rows, so per-chip flops are
    # ~win/h of the single-chip full frame (the parallel speedup is
    # h/win, not s — the halo is the overhead)
    solo = aot.eval_spatial_record(topology="v5e:2x2", spatial=1,
                                   h=128, w=192)
    win_frac = (128 // 4 + 2 * 16) / 128  # = 0.5
    ratio = rec["flops_per_step"] / solo["flops_per_step"]
    assert 0.9 * win_frac <= ratio <= 1.1 * win_frac, ratio
