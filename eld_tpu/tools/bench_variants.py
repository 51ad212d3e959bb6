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
COMBO_TIMEOUT_S = 600


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
    """Static XLA:TPU cost/memory analysis via an offline topology —
    mirrors the on-TPU 'auto' noise choice (pallas at this geometry)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from eld_tpu.tools.aot import compile_for, cost_record

    aligned = (PATCH * 4) % 128 == 0 and PATCH % 8 == 0
    state, step, data = _build_train(arch, skip_mode, upsample, remat, f32,
                                     skip_bf16,
                                     noise_impl="pallas" if aligned else "jnp")
    compiled = compile_for(step, state, data, jax.random.PRNGKey(0),
                           topology=topology)
    rec = cost_record(compiled)
    rec["aot_topology"] = topology
    return rec


def _measure_eval_aot(topology, skip_mode: str, upsample: str) -> dict:
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
    fwd = make_eval_forward(model, chop=True)
    x = jax.ShapeDtypeStruct((1, EVAL_H, EVAL_W, 4), jnp.float32)
    compiled = compile_for(fwd, params, x, topology=topology)
    rec = cost_record(compiled)
    rec["aot_topology"] = topology
    return rec


def _measure_eval(skip_mode: str, upsample: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as onp

    from eld_tpu.models import build_arch
    from eld_tpu.train.steps import make_eval_forward

    model = build_arch("unet", 4, 4, dtype=jnp.bfloat16,
                       skip_mode=skip_mode, upsample=upsample)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 4)))["params"]
    fwd = make_eval_forward(model, chop=True)
    x = jnp.asarray(onp.random.default_rng(0).random(
        (1, EVAL_H, EVAL_W, 4), dtype=onp.float32))
    float(fwd(params, x).sum())  # compile + prove full execution
    reps = 6
    t0 = time.perf_counter()
    outs = [fwd(params, x) for _ in range(reps)]
    jax.block_until_ready(outs)
    return {"fullframe_fps": round(reps / (time.perf_counter() - t0), 2)}


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
    else:
        skip_mode, upsample = argv[1:3]
        rec = (_measure_eval_aot(aot, skip_mode, upsample) if aot
               else _measure_eval(skip_mode, upsample))
        rec.update(mode="eval_fullframe", arch="unet")
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
