"""Hardware A/B sweep of the decoder bandwidth variants (VERDICT r2 #4).

Measures the fused synthetic-noise train step (same protocol as bench.py:
512^2 batch 16, bf16 compute, ELD noise, warmup 3, 2x10 timed steps taking
the slower pass) for every combination of

    arch      in {unet_s2d, unet}
    skip_mode in {concat, split}   (split: concat-free decoder)
    upsample  in {convt, d2s}      (d2s: 1x1-conv + depth-to-space)

plus XLA ``cost_analysis()`` FLOPs and bytes-accessed per step, so a
throughput change can be attributed to traffic.  Each combo runs in its
own subprocess (this rig's TPU admits one client at a time, and a fresh
process gives every combo a fresh HBM arena — see bench.py peak_only for
the fragmentation rationale).

The variants are exact re-parameterizations (tests/test_unet.py::
test_bandwidth_variants_exact): identical param tree, forward, and
gradients — so this sweep is purely a performance decision, no quality
gate needed.

Also sweeps the full-frame chopped eval (1424x2128x4, parity unet) over
the same flags: the decoder-side concat of the finest level is largest
there.

Usage (on the TPU):  python -m eld_tpu.tools.bench_variants
With no TPU attached: ``--aot [v5e:2x2]`` compiles every combo against an
offline TPU topology descriptor (tools/aot.py) and reports the XLA:TPU
cost/memory analysis instead of wall-clock — the real compiler's
bytes-per-step attribution, available even while the device tunnel is
down (children force the CPU host so nothing can hang on a wedged grant).
Reference workload benchmarked: train_syn.py:100-113 (512^2 patches).
"""

from __future__ import annotations

import itertools
import json
import os
import subprocess
import sys
import time

_SMOKE = os.environ.get("ELD_BENCH_VARIANTS_SMOKE") == "1"
PATCH = 64 if _SMOKE else 512
BATCH = 2 if _SMOKE else 16
EVAL_H, EVAL_W = (128, 192) if _SMOKE else (1424, 2128)
STEPS = 10
WARMUP = 3
COMBO_TIMEOUT_S = 900  # device claims through the tunnel vary ~0.1-450s
# day to day (r5 saw a 444s claim on a healthy chip); each combo child
# pays its own claim


def _measure_train(arch: str, skip_mode: str, upsample: str,
                   remat: bool = False, f32: bool = False,
                   skip_bf16: bool = False) -> dict:
    import jax

    state, step, data = _build_train(arch, skip_mode, upsample, remat, f32,
                                     skip_bf16)
    rec = {}
    try:
        # AOT-compile once and time THAT executable (calling the jit
        # wrapper again would compile a second time — the AOT cache is
        # separate — wasting ~30-60s/combo on this rig's first-compiles)
        compiled = step.lower(state, data, jax.random.PRNGKey(0)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns one dict per device
            ca = ca[0]
        rec["flops_per_step"] = ca.get("flops")
        rec["bytes_per_step"] = ca.get("bytes accessed")
        step = compiled
    except Exception as e:  # cost analysis is best-effort
        rec["cost_analysis_error"] = type(e).__name__

    for i in range(WARMUP):
        state, m = step(state, data, jax.random.PRNGKey(i))
    float(m["Pixel"])  # D2H scalar fetch: see bench.py run() rationale

    def timed(offset):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, m = step(state, data, jax.random.PRNGKey(offset + i))
        float(m["Pixel"])
        return BATCH * STEPS / (time.perf_counter() - t0)

    rec["patches_per_sec"] = round(min(timed(100), timed(200)), 2)
    return rec


def _build_train(arch, skip_mode, upsample, remat, f32, skip_bf16,
                 noise_impl="auto"):
    import jax
    import jax.numpy as jnp
    import numpy as onp

    from eld_tpu.models import build_arch
    from eld_tpu.noise import load_camera_params
    from eld_tpu.train import create_train_state, make_train_step

    model = build_arch(arch, 4, 4,
                       dtype=jnp.float32 if f32 else jnp.bfloat16,
                       skip_mode=skip_mode, upsample=upsample, remat=remat,
                       skip_dtype=jnp.bfloat16 if skip_bf16 else None)
    bank = load_camera_params()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, PATCH, PATCH, 4))
    step = make_train_step(model, loss="l1", noise_model="eld", bank=bank,
                           noise_impl=noise_impl)
    clean = jnp.asarray(onp.random.default_rng(0).random(
        (BATCH, PATCH, PATCH, 4), dtype=onp.float32))
    return state, step, {"clean": clean}


def _measure_train_aot(topology, arch, skip_mode, upsample,
                       remat=False, f32=False, skip_bf16=False) -> dict:
    """Static XLA:TPU cost/memory analysis via an offline topology.

    noise_impl is pinned to 'jnp' (the shipped 'auto' resolves to jnp at
    the sub-32 operating-point batches this AOT path models, and jnp is
    the impl that also lowers offline on the CPU host — the Pallas
    kernel is TPU-only)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from eld_tpu.tools.aot import compile_for, cost_record

    state, step, data = _build_train(arch, skip_mode, upsample, remat, f32,
                                     skip_bf16, noise_impl="jnp")
    compiled = compile_for(step, state, data, jax.random.PRNGKey(0),
                           topology=topology)
    rec = cost_record(compiled)
    rec["aot_topology"] = topology
    return rec


def _measure_eval_aot(topology, skip_mode: str, upsample: str,
                      chop: bool = True, batch: int = 1) -> dict:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from eld_tpu.models import build_arch
    from eld_tpu.tools.aot import compile_for, cost_record
    from eld_tpu.train.steps import make_eval_forward

    model = build_arch("unet", 4, 4, dtype=jnp.bfloat16,
                       skip_mode=skip_mode, upsample=upsample)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 4)))["params"]
    fwd = make_eval_forward(model, chop=chop)
    x = jax.ShapeDtypeStruct((batch, EVAL_H, EVAL_W, 4), jnp.float32)
    compiled = compile_for(fwd, params, x, topology=topology)
    rec = cost_record(compiled)
    rec.update(aot_topology=topology, chop=chop, batch=batch)
    return rec


def _measure_gate(variant: str) -> dict:
    """Re-measure the two compile-time gates baked into train/steps.py
    (VERDICT r4 #7): donation-under-mesh (~15x compile blowup on jax
    0.9.0) and jnp-noise-under-mesh (~116 s vs ~12 s for pallas).  Run via
    ``--modes gate`` on the TPU; compare against BASELINE.md's "Round-2
    mesh-path measurements" table (same geometry: 512^2 batch 8).

    variants: jit_donate (the no-mesh bench path), mesh_pallas (the mesh
    default), mesh_jnp, mesh_pallas_donate."""
    import jax
    import jax.numpy as jnp
    import numpy as onp

    from eld_tpu.models import build_arch
    from eld_tpu.noise import load_camera_params
    from eld_tpu.parallel import MeshSpec, make_mesh
    from eld_tpu.parallel.mesh import replicated, shard_batch
    from eld_tpu.train import create_train_state, make_train_step

    B = 2 if _SMOKE else 8
    model = build_arch("unet_s2d", 4, 4, dtype=jnp.bfloat16)
    bank = load_camera_params()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, PATCH, PATCH, 4))
    mesh, kw = None, {}
    if variant.startswith("mesh"):
        mesh = make_mesh(MeshSpec(1, 1))
        kw = dict(noise_impl="jnp" if "jnp" in variant else "pallas",
                  mesh_donate="donate" in variant)
    else:
        kw = dict(donate="donate" in variant)
    step = make_train_step(model, loss="l1", noise_model="eld", bank=bank,
                           mesh=mesh, **kw)
    clean = onp.random.default_rng(0).random((B, PATCH, PATCH, 4),
                                             dtype=onp.float32)
    key = jax.random.PRNGKey(0)
    if mesh is not None:  # commit inputs (steps.py NOTE): uncommitted
        state = jax.device_put(state, replicated(mesh))
        key = jax.device_put(key, replicated(mesh))
        batch = shard_batch(mesh, {"clean": clean})
    else:
        batch = {"clean": jnp.asarray(clean)}

    t0 = time.perf_counter()
    state, m = step(state, batch, key)
    float(m["Pixel"])
    compile_s = time.perf_counter() - t0

    def timed(off):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, m = step(state, batch, jax.random.fold_in(key, off + i))
        float(m["Pixel"])
        return B * STEPS / (time.perf_counter() - t0)

    return {"variant": variant,
            "compile_plus_first_s": round(compile_s, 1),
            "patches_per_sec": round(max(timed(100), timed(200)), 2)}


def _measure_peak(impl: str, batch: int) -> dict:
    """Noise-impl A/B at large batch (the peak-throughput regime).

    The round-5 operating-point A/B (BASELINE.md) measured batch 8/16
    only and flipped auto to jnp; the subsequent full bench showed peak
    @batch 128 regressing 9.7% — at large batch the per-pixel noise math
    dominates the step, the regime where the fused Pallas kernel's VPU
    schedule can beat XLA's generic lowering.  This mode maps the
    crossover so the auto gate can be batch-aware.  Median-of-5 windows
    (same rig as bench.py run())."""
    import jax
    import jax.numpy as jnp
    import numpy as onp

    state, step, _ = _build_train("unet_s2d", "concat", "convt", False,
                                  False, False, noise_impl=impl)
    b = min(batch, 4) if _SMOKE else batch
    data = {"clean": jnp.asarray(onp.random.default_rng(0).random(
        (b, PATCH, PATCH, 4), dtype=onp.float32))}
    t0 = time.perf_counter()
    for i in range(WARMUP):
        state, m = step(state, data, jax.random.PRNGKey(i))
    float(m["Pixel"])
    warm_s = time.perf_counter() - t0

    windows = []
    for w in range(5):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, m = step(state, data, jax.random.PRNGKey(100 * (w + 1) + i))
        float(m["Pixel"])
        windows.append(b * STEPS / (time.perf_counter() - t0))
    s = sorted(windows)
    med = s[2]
    return {"noise_impl": impl, "batch": b,
            "patches_per_sec": round(med, 2),
            "mad": round(sorted(abs(x - med) for x in windows)[2], 2),
            "compile_plus_warmup_s": round(warm_s, 1)}


def _measure_eval(skip_mode: str, upsample: str, chop: bool = True,
                  batch: int = 1, arch: str = "unet") -> dict:
    """Full-frame eval forward at the SID geometry.

    ``chop=True`` is the reference's released eval protocol (4-tile
    shave/stitch, models/ELD_model.py:434-467); ``chop=False`` is the
    whole frame through the net in one program — batch-1 temp HBM is only
    2.34 GB on v5e (round-3 AOT study), so chop is a latency CHOICE here,
    not a memory necessity.  ``batch>1`` measures offline-reprocessing
    throughput (many frames, latency-insensitive).  ``arch`` defaults to
    the parity topology; ``unet_s2d`` measures the promoted arch's
    serving capability (make_eval_forward edge-pads 1424x2128 to its
    32-px alignment and crops back).  Median of 5 windows with MAD, same
    robustness rig as bench.py."""
    import jax
    import jax.numpy as jnp
    import numpy as onp

    from eld_tpu.models import build_arch
    from eld_tpu.train.steps import make_eval_forward

    model = build_arch(arch, 4, 4, dtype=jnp.bfloat16,
                       skip_mode=skip_mode, upsample=upsample)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 4)))["params"]
    fwd = make_eval_forward(model, chop=chop)
    x = jnp.asarray(onp.random.default_rng(0).random(
        (batch, EVAL_H, EVAL_W, 4), dtype=onp.float32))
    float(fwd(params, x).sum())  # compile + prove full execution
    reps, k = max(1, 6 // batch), 5
    windows = []
    for _ in range(k):
        t0 = time.perf_counter()
        outs = [fwd(params, x) for _ in range(reps)]
        jax.block_until_ready(outs)
        windows.append(batch * reps / (time.perf_counter() - t0))
    s = sorted(windows)
    med = s[k // 2]
    return {"fullframe_fps": round(med, 2),
            "fps_mad": round(sorted(abs(w - med) for w in windows)[k // 2], 2),
            "chop": chop, "batch": batch}


def _child(argv):
    aot = os.environ.get("ELD_BENCH_VARIANTS_AOT")  # topology name or unset
    mode = argv[0]
    if mode == "train":
        arch, skip_mode, upsample = argv[1:4]
        flags = argv[4:]
        remat, f32, skip_bf16 = ("remat" in flags, "f32" in flags,
                                 "skipbf16" in flags)
        if aot:
            rec = _measure_train_aot(aot, arch, skip_mode, upsample,
                                     remat=remat, f32=f32,
                                     skip_bf16=skip_bf16)
        else:
            rec = _measure_train(arch, skip_mode, upsample, remat=remat,
                                 f32=f32, skip_bf16=skip_bf16)
        rec.update(mode="train", arch=arch, remat=remat, f32=f32,
                   skip_bf16=skip_bf16)
    elif mode == "gate":
        rec = _measure_gate(argv[1])
        rec.update(mode="gate")
        print(json.dumps(rec), flush=True)
        return
    elif mode == "peak":
        rec = _measure_peak(argv[1], int(argv[2]))
        rec.update(mode="peak")
        print(json.dumps(rec), flush=True)
        return
    else:
        skip_mode, upsample = argv[1:3]
        flags = argv[3:]
        chop = "nochop" not in flags
        arch = "unet_s2d" if "s2d" in flags else "unet"
        batch = next((int(f[1:]) for f in flags
                      if f.startswith("b") and f[1:].isdigit()), 1)
        if aot:
            rec = _measure_eval_aot(aot, skip_mode, upsample, chop=chop,
                                    batch=batch)
        else:
            rec = _measure_eval(skip_mode, upsample, chop=chop, batch=batch,
                                arch=arch)
        rec.update(mode="eval_fullframe", arch=arch)
    rec.update(skip_mode=skip_mode, upsample=upsample)
    print(json.dumps(rec), flush=True)


def main():
    aot = None
    if "--aot" in sys.argv:
        i = sys.argv.index("--aot")
        aot = (sys.argv[i + 1] if i + 1 < len(sys.argv)
               and not sys.argv[i + 1].startswith("-") else "v5e:2x2")
        os.environ["ELD_BENCH_VARIANTS_AOT"] = aot
        platform = f"tpu-aot:{aot}"
    else:
        sys.path.insert(0, ".")
        try:
            from bench import probe_device
            platform = probe_device()
        except ImportError:
            platform = "unknown"
        if platform is None:
            print(json.dumps({"error": "tpu_unreachable"}))
            sys.exit(2)

    out_path = None
    if "--out" in sys.argv:  # crash-proof: append each record as it lands
        i = sys.argv.index("--out")
        if i + 1 >= len(sys.argv):
            sys.exit("--out needs a file path")
        out_path = sys.argv[i + 1]

    modes = None  # default: the full sweep
    if "--modes" in sys.argv:  # e.g. --modes eval  (skip the train combos)
        modes = set(sys.argv[sys.argv.index("--modes") + 1].split(","))

    results = []
    combos = [("train", arch, sm, up)
              for arch, sm, up in itertools.product(
                  ("unet_s2d", "unet"), ("concat", "split"), ("convt", "d2s"))]
    # remat-vs-traffic tradeoff on the stock decoders (VERDICT r2 #4)
    combos += [("train", "unet_s2d", "concat", "convt", "remat"),
               ("train", "unet", "concat", "convt", "remat")]
    # bf16 skip storage on the f32 (parity-dtype) path: f32 baseline vs
    # f32-compute + bf16-stored skips (the quality-conservative traffic cut)
    combos += [("train", "unet", "concat", "convt", "f32"),
               ("train", "unet", "concat", "convt", "f32", "skipbf16"),
               ("train", "unet_s2d", "concat", "convt", "f32"),
               ("train", "unet_s2d", "concat", "convt", "f32", "skipbf16")]
    combos += [("eval", sm, up)
               for sm, up in itertools.product(("concat", "split"),
                                               ("convt", "d2s"))]
    # serving-path harvest (VERDICT r4 #1): the chopped protocol leaves the
    # eval forward at ~61% of HBM peak; no-chop drops the tile redundancy
    # and stack/stitch copies.  Batch>1 = offline-reprocessing throughput.
    combos += [("eval", sm, "convt", "nochop") for sm in ("concat", "split")]
    combos += [("eval", "split", "convt", "nochop", f"b{b}")
               for b in (4, 8, 16)]
    # promoted-arch serving capability: unet_s2d full frame (edge-padded
    # to its 32-px alignment by make_eval_forward), chop and no-chop,
    # at the shipped split decoder
    combos += [("eval", "split", "convt", "s2d"),
               ("eval", "split", "convt", "nochop", "s2d")]
    if modes and "peak" in modes:
        # large-batch noise-impl crossover map (see _measure_peak): only on
        # request — calibration for the batch-aware auto gate
        combos += [("peak", impl, str(b))
                   for b in (32, 64, 128) for impl in ("jnp", "pallas")]
    if modes and "gate" in modes:
        # compile-gate re-measurements (steps.py): only on request — they
        # are one-off calibration runs, not part of the standing sweep
        combos += [("gate", v) for v in
                   ("jit_donate", "mesh_pallas", "mesh_jnp",
                    "mesh_pallas_donate")]
    if modes:
        combos = [c for c in combos if c[0] in modes]
    for combo in combos:
        label = "/".join(combo)
        try:
            out = subprocess.run(
                [sys.executable, "-m", "eld_tpu.tools.bench_variants",
                 "--one", *combo],
                capture_output=True, text=True, timeout=COMBO_TIMEOUT_S)
            sys.stderr.write(out.stderr[-1500:])
            rec = json.loads(out.stdout.strip().splitlines()[-1])
        except Exception as e:
            rec = {"mode": combo[0], "combo": label,
                   "error": type(e).__name__}
        print(f"[variants] {label}: {rec}", file=sys.stderr)
        results.append(rec)
        if out_path:
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
    print(json.dumps({"platform": platform, "results": results}))


def cli() -> int:
    """Console-script entry: discard main()'s return value (it is data
    for tests/importers, not an exit status — sys.exit(non-empty dict/
    list) would turn every success into exit code 1)."""
    main()
    return 0


if __name__ == "__main__":
    if "--one" in sys.argv:
        _child(sys.argv[sys.argv.index("--one") + 1:])
    else:
        main()
