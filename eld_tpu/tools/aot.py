"""Offline AOT compilation against TPU *topology descriptors*.

``jax.experimental.topologies`` ships the TPU compiler's hardware models,
so a jitted program can be lowered and compiled for a real chip (v5e here)
with NO device attached — on this rig that means the full XLA:TPU
``cost_analysis()`` (FLOPs, bytes accessed) and ``memory_analysis()``
(HBM temp/argument footprints) stay available even while the tunneled
TPU is unreachable.  Execution still needs hardware; these are static
numbers from the same compiler pass that runs on-device.

Used by ``tools/roofline --aot`` and ``tools/bench_variants --aot`` for
the bandwidth-variant attribution (VERDICT r2 #4), and by the multichip
AOT check (the 8-device mesh train step — shard_map'd Pallas noise,
gradient psum and all — compiles for a real ``v5e:2x4`` topology:
``tests/test_aot.py``).

The reference has no analog: its only static analysis is a parameter
count (``models/networks.py:103-110``).
"""

from __future__ import annotations

# Topology names accepted by the PJRT TPU compiler model, e.g. "v5e:2x2"
# (4 chips) or "v5e:2x4" (one v5e-8 slice).  A single-chip program is
# lowered onto device 0 of the smallest valid slice.
DEFAULT_TOPOLOGY = "v5e:2x2"


def remove_stale_libtpu_lock(path: str = "/tmp/libtpu_lockfile") -> bool:
    """Remove libtpu's multi-process lockfile IFF no live process holds
    it.  Staleness is checked by actually acquiring the flock
    non-blocking — a lock held by a running TPU client (the one-client
    rig's active bench/training job) stays untouched.  Returns True if
    the file was removed."""
    import fcntl
    import os

    try:
        fd = os.open(path, os.O_RDWR)
    except OSError:
        return False  # already gone
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            return False  # held by a live process — leave it alone
        try:
            os.remove(path)
        except OSError:
            return False
        return True
    finally:
        os.close(fd)


def topology_devices(topology: str = DEFAULT_TOPOLOGY):
    """The offline device list for a named TPU topology.

    Initializing the PJRT TPU plugin (even for a device-less topology
    descriptor) takes libtpu's /tmp/libtpu_lockfile; a device probe
    killed mid-claim can leave that lock stuck and every offline
    compile then aborts.  Retry with the stale lock removed (flock
    staleness check — a lock held by a live client is never broken).
    """
    import time

    from jax.experimental import topologies

    last = None
    for attempt in range(3):
        try:
            topo = topologies.get_topology_desc(platform="tpu",
                                                topology_name=topology)
            break
        except Exception as e:  # jax.errors.JaxRuntimeError
            last = e
            if "lockfile" not in str(e):
                raise
            remove_stale_libtpu_lock()
            time.sleep(1.0 + attempt)
    else:
        raise last
    devs = topo.devices
    return list(devs() if callable(devs) else devs)


def single_device_sharding(topology: str = DEFAULT_TOPOLOGY):
    """A replicated sharding pinned to chip 0 of ``topology`` — tagging
    inputs with it makes ``jit(...).lower`` target the offline TPU."""
    import numpy as onp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = onp.array(topology_devices(topology)[:1])
    return NamedSharding(Mesh(devs, ("aot",)), P())


def abstractify(tree, sharding):
    """Concrete (or abstract) pytree -> ShapeDtypeStructs carrying
    ``sharding``, ready for ``jitted.lower(*...)``."""
    import jax

    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding),
        tree)


def compile_for(jitted, *args, sharding=None, topology: str = DEFAULT_TOPOLOGY):
    """AOT-compile ``jitted(*args)`` for the offline TPU.

    args may be concrete arrays or ShapeDtypeStructs; every leaf is
    re-tagged with ``sharding`` (default: replicated on chip 0 of
    ``topology``).  Returns the compiled executable (not runnable here —
    use ``.cost_analysis()`` / ``.memory_analysis()`` / ``.as_text()``).
    """
    if sharding is None:
        sharding = single_device_sharding(topology)
    return jitted.lower(*abstractify(args, sharding)).compile()


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}


def collective_bytes(hlo: str) -> dict:
    """Count the cross-chip collectives in compiled HLO text and sum their
    payload bytes (output shapes of all-reduce / all-gather /
    reduce-scatter / collective-permute / all-to-all; async ``-start``
    forms included, ``-done`` echoes skipped).

    ``-start`` results are tuples carrying the operand alias next to the
    real result, so for those only the LARGEST component counts (a fused
    multi-buffer start would be undercounted, never doubled); sync forms
    sum all components (a fused all-reduce's tuple is all payload).

    This is the traffic XLA actually put on ICI for a sharded program —
    the measured form of BASELINE.md's hand-derived 31 MB/step gradient
    all-reduce."""
    import re

    ops = r"all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all"
    pat = re.compile(rf"= (.*?)\s(?:{ops})(-start)?\(")
    total, count = 0, 0
    for line in hlo.splitlines():
        m = pat.search(line)
        if not m:
            continue
        count += 1
        sizes = []
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", m.group(1)):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            sizes.append(n * _DTYPE_BYTES[dt])
        if sizes:
            total += max(sizes) if m.group(2) else sum(sizes)
    return {"collective_ops": count, "collective_bytes": total}


def cost_record(compiled) -> dict:
    """FLOPs / bytes / HBM-footprint dict from a compiled executable.

    For SPMD (multi-device) programs these numbers are PER-DEVICE — the
    compiled module is the one program every chip runs (verified by the
    spatial-eval window-fraction test in tests/test_aot.py)."""
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax: one dict per device
        ca = ca[0]
    mem = compiled.memory_analysis()
    return {
        "flops_per_step": ca.get("flops"),
        "bytes_per_step": ca.get("bytes accessed"),
        "hbm_temp_bytes": getattr(mem, "temp_size_in_bytes", None),
        "hbm_argument_bytes": getattr(mem, "argument_size_in_bytes", None),
        "hbm_output_bytes": getattr(mem, "output_size_in_bytes", None),
    }


def eval_spatial_record(topology: str = "v5e:2x4", spatial: int | None = None,
                        h: int = 1424, w: int = 2128, batch: int = 1,
                        arch: str = "unet") -> dict:
    """Static XLA:TPU cost + ICI traffic of the spatially-sharded
    full-frame eval (``parallel/spatial.py``) at the SID frame geometry,
    compiled against an offline topology.  ``spatial=1`` compiles the
    plain single-chip full-frame forward for comparison (the per-chip
    HBM temp footprint is the number that shards down ~1/N; the halo
    windows add ~2*halo/slab compute overhead)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from eld_tpu.models import build_arch
    from eld_tpu.parallel.mesh import MeshSpec, make_mesh
    from eld_tpu.parallel.spatial import make_spatial_forward

    devs = topology_devices(topology)
    spatial = len(devs) if spatial is None else spatial
    model = build_arch(arch, 4, 4, dtype=jnp.bfloat16)
    params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 4), jnp.float32))["params"]
    x = jax.ShapeDtypeStruct((batch, h, w, 4), jnp.float32)

    if spatial == 1:
        fwd = jax.jit(lambda p, t: model.apply({"params": p}, t))
        compiled = compile_for(fwd, params, x, topology=topology)
    else:
        mesh = make_mesh(MeshSpec(data=1, spatial=spatial),
                         devices=devs[:spatial])
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        fwd = make_spatial_forward(
            lambda p, t: model.apply({"params": p}, t), mesh)
        compiled = fwd.lower(abstractify(params, repl),
                             abstractify(x, repl)).compile()
    rec = cost_record(compiled)
    rec.update(collective_bytes(compiled.as_text()),
               aot_topology=topology, spatial=spatial,
               h=h, w=w, batch=batch, arch=arch)
    return rec


def _main(argv=None):
    """``python -m eld_tpu.tools.aot spatial-eval [--topology v5e:2x4]
    [--spatial N] [--h 1424] [--w 2128]`` — one JSON line."""
    import argparse
    import json

    p = argparse.ArgumentParser(description=_main.__doc__)
    p.add_argument("report", choices=["spatial-eval"])
    p.add_argument("--topology", default="v5e:2x4")
    p.add_argument("--spatial", type=int, default=None)
    p.add_argument("--h", type=int, default=1424)
    p.add_argument("--w", type=int, default=2128)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--arch", default="unet")
    ns = p.parse_args(argv)
    rec = eval_spatial_record(ns.topology, ns.spatial, ns.h, ns.w,
                              ns.batch, ns.arch)
    print(json.dumps(rec))


if __name__ == "__main__":
    _main()
