"""Roofline / MFU report for the fused train step (profiling subsystem).

Formalizes the BASELINE.md cost-analysis study as a reusable CLI: AOT-
compiles the fused synthetic-noise train step (noise + fwd + bwd + Adam)
for a given arch/config, prints XLA ``cost_analysis()`` FLOPs and bytes
per step, the arithmetic intensity against the chip's ridge point, the
bandwidth-bound step-time floor, and — unless ``--no-run`` — the measured
step time with achieved TFLOP/s (MFU) and HBM GB/s against peak.

The reference ships no profiler integration at all (SURVEY §5); this plus
``--profile`` (jax.profiler traces) and the throughput meters are the
TPU-native observability stack.

Usage:
  python -m eld_tpu.tools.roofline --arch unet_s2d --batch 16 --bf16
  python -m eld_tpu.tools.roofline --arch unet --skip_mode split --no-run
  python -m eld_tpu.tools.roofline --arch unet --aot v5e:2x2   # no TPU needed

``--aot TOPOLOGY`` compiles against an offline TPU topology descriptor
(tools/aot.py): the real XLA:TPU cost/memory analysis with no device
attached (static only — implies --no-run; forces the host CPU backend so
a wedged device grant can't hang the report).

Peaks default to TPU v5e (197 TFLOP/s bf16, 819 GB/s HBM); override with
--peak_tflops / --peak_gbs for other chips.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_step(ns, mesh=None):
    import jax
    import jax.numpy as jnp
    import numpy as onp

    from eld_tpu.models import build_arch
    from eld_tpu.noise import load_camera_params
    from eld_tpu.train import create_train_state, make_train_step

    model = build_arch(
        ns.arch, 4, 4, base_width=ns.base_width,
        dtype=jnp.bfloat16 if ns.bf16 else jnp.float32,
        remat=ns.remat, skip_mode=ns.skip_mode, upsample=ns.upsample,
        skip_dtype=jnp.bfloat16 if ns.skip_bf16 else None)
    bank = load_camera_params()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, ns.patch, ns.patch, 4))
    step = make_train_step(model, loss="l1", noise_model=ns.noise, bank=bank,
                           noise_impl=ns.noise_impl, mesh=mesh)
    n = ns.batch * (ns.mesh_data if mesh is not None else 1)
    clean = jnp.asarray(onp.random.default_rng(0).random(
        (n, ns.patch, ns.patch, 4), dtype=onp.float32))
    return state, step, {"clean": clean}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--arch", default="unet_s2d")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--patch", type=int, default=512)
    p.add_argument("--noise", default="eld")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--f32", dest="bf16", action="store_false")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--skip_mode", default="split", choices=["concat", "split"])
    p.add_argument("--upsample", default="convt", choices=["convt", "d2s"])
    p.add_argument("--skip_bf16", action="store_true")
    p.add_argument("--base_width", type=int, default=32)
    p.add_argument("--noise_impl", default="auto",
                   choices=["auto", "pallas", "jnp"])
    p.add_argument("--aot", metavar="TOPOLOGY", default=None,
                   help="compile against an offline TPU topology (e.g. "
                        "v5e:2x2) — static analysis with no device; "
                        "implies --no-run")
    p.add_argument("--mesh_data", type=int, default=1,
                   help="with --aot: compile the DATA-parallel mesh step "
                        "over this many topology chips (batch = per-chip "
                        "batch x mesh_data) and report the gradient "
                        "all-reduce traffic XLA inserted")
    p.add_argument("--peak_tflops", type=float, default=197.0,
                   help="chip peak TFLOP/s at the compute dtype (v5e bf16)")
    p.add_argument("--peak_gbs", type=float, default=819.0,
                   help="chip peak HBM GB/s (v5e)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--no-run", dest="run", action="store_false",
                   help="static analysis only (no device execution timing)")
    ns = p.parse_args(argv)

    import jax

    if ns.mesh_data > 1 and not ns.aot:
        p.error("--mesh_data needs --aot (offline topology chips)")
    if ns.aot:
        # static-only, and never let a wedged device grant hang the report
        jax.config.update("jax_platforms", "cpu")
        ns.run = False
        # "auto" = jnp on every platform since round 5 (steps._synthesize
        # gate history), so no CPU-vs-TPU mirroring is needed here; pass
        # --noise_impl pallas to analyze the fused-kernel variant.

    mesh_extra = {}
    if ns.aot and ns.mesh_data > 1:
        from eld_tpu.parallel.mesh import (MeshSpec, batch_sharding,
                                           make_mesh, replicated)
        from eld_tpu.tools import aot

        mesh = make_mesh(MeshSpec(data=ns.mesh_data),
                         devices=aot.topology_devices(ns.aot))
        state, step, data = build_step(ns, mesh=mesh)
        abstract = (aot.abstractify(state, replicated(mesh)),
                    {"clean": aot.abstractify(data["clean"],
                                              batch_sharding(mesh))},
                    aot.abstractify(jax.random.PRNGKey(0), replicated(mesh)))
        compiled = step.lower(*abstract).compile()
        mesh_extra = aot.collective_bytes(compiled.as_text())
        mesh_extra["mesh_data"] = ns.mesh_data
    elif ns.aot:
        from eld_tpu.tools.aot import compile_for

        state, step, data = build_step(ns)
        compiled = compile_for(step, state, data, jax.random.PRNGKey(0),
                               topology=ns.aot)
    else:
        state, step, data = build_step(ns)
        compiled = step.lower(state, data, jax.random.PRNGKey(0)).compile()
        # time the AOT executable itself — calling the jit wrapper again
        # would compile a second time (separate cache; ~30-60s here)
        step = compiled
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops") or 0.0)
    nbytes = float(ca.get("bytes accessed") or 0.0)
    intensity = flops / nbytes if nbytes else float("nan")
    ridge = ns.peak_tflops * 1e12 / (ns.peak_gbs * 1e9)
    floor_ms = nbytes / (ns.peak_gbs * 1e9) * 1e3
    rec = {
        "arch": ns.arch, "batch": ns.batch, "patch": ns.patch,
        "noise": ns.noise, "bf16": ns.bf16, "remat": ns.remat,
        "skip_mode": ns.skip_mode, "upsample": ns.upsample,
        "skip_bf16": ns.skip_bf16,
        **({"aot_topology": ns.aot,
            "hbm_temp_bytes": compiled.memory_analysis().temp_size_in_bytes}
           if ns.aot else {}),
        **mesh_extra,
        "flops_per_step": flops, "bytes_per_step": nbytes,
        "arith_intensity_flop_per_byte": round(intensity, 1),
        "ridge_flop_per_byte": round(ridge, 1),
        "bound": "hbm" if intensity < ridge else "compute",
        "bw_floor_ms": round(floor_ms, 2),
    }
    print(f"[roofline] {ns.arch} b{ns.batch} {ns.patch}^2 "
          f"{'bf16' if ns.bf16 else 'f32'}: {flops/1e12:.2f} TF, "
          f"{nbytes/1e9:.1f} GB, intensity {intensity:.0f} FLOP/B "
          f"(ridge {ridge:.0f}) -> {rec['bound']}-bound, "
          f"floor {floor_ms:.1f} ms/step", file=sys.stderr)

    if ns.run:
        for i in range(3):
            state, m = step(state, data, jax.random.PRNGKey(i))
        float(m["Pixel"])  # D2H fetch (see bench.py run())
        t0 = time.perf_counter()
        for i in range(ns.steps):
            state, m = step(state, data, jax.random.PRNGKey(100 + i))
        float(m["Pixel"])
        dt = (time.perf_counter() - t0) / ns.steps
        rec.update({
            "platform": jax.devices()[0].platform,
            "step_ms": round(dt * 1e3, 2),
            "patches_per_sec": round(ns.batch / dt, 2),
            "achieved_tflops": round(flops / dt / 1e12, 2),
            "mfu_pct": round(flops / dt / (ns.peak_tflops * 1e12) * 100, 1),
            "achieved_gbs": round(nbytes / dt / 1e9, 1),
            "hbm_pct": round(nbytes / dt / (ns.peak_gbs * 1e9) * 100, 1),
        })
        print(f"[roofline] measured {rec['step_ms']} ms/step = "
              f"{rec['patches_per_sec']} patches/s | "
              f"{rec['achieved_tflops']} TFLOP/s ({rec['mfu_pct']}% MXU) | "
              f"{rec['achieved_gbs']} GB/s ({rec['hbm_pct']}% HBM)",
              file=sys.stderr)
    print(json.dumps(rec))
    return rec


def cli() -> int:
    """Console-script entry: discard main()'s return value (it is data
    for tests/importers, not an exit status — sys.exit(non-empty dict/
    list) would turn every success into exit code 1)."""
    main()
    return 0


if __name__ == "__main__":
    main()
