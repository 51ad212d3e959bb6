"""Eval-path experiment: chop vs no-chop full-frame forward, concat vs split.

Round-4 sweep measured eval at ~61% of HBM peak (chop protocol) vs the
train net's 70-90%.  Hypothesis: the no-chop full-frame forward (fits
easily at bf16 forward-only) drops the 4% tile redundancy + stack/stitch
copies and may compile to a better schedule.  Serving could default to
no-chop with a chop fallback; parity eval keeps chop.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as onp

from eld_tpu.models import build_arch
from eld_tpu.train.steps import make_eval_forward

H, W = 1424, 2128
REPS = 6
K = 5


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def run(skip_mode, chop, in_dtype=jnp.float32, batch=1):
    model = build_arch("unet", 4, 4, dtype=jnp.bfloat16, skip_mode=skip_mode)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)))["params"]
    fwd = make_eval_forward(model, chop=chop)
    x = jnp.asarray(
        onp.random.default_rng(0).random((batch, H, W, 4), dtype=onp.float32)
    ).astype(in_dtype)
    t0 = time.perf_counter()
    float(fwd(params, x).sum())  # compile + full-execution barrier
    compile_s = time.perf_counter() - t0
    windows = []
    for _ in range(K):
        t0 = time.perf_counter()
        outs = [fwd(params, x) for _ in range(REPS)]
        jax.block_until_ready(outs)
        windows.append(batch * REPS / (time.perf_counter() - t0))
    med = median(windows)
    rec = {
        "skip_mode": skip_mode, "chop": chop, "batch": batch,
        "in_dtype": str(jnp.dtype(in_dtype)),
        "fps": round(med, 2),
        "mad": round(median([abs(w - med) for w in windows]), 2),
        "windows": [round(w, 2) for w in windows],
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    run("concat", chop=True)            # round-4 sweep baseline: ~19.0
    run("split", chop=True)             # round-4 sweep: ~21.3
    run("concat", chop=False)
    run("split", chop=False)
    run("split", chop=False, in_dtype=jnp.bfloat16)
    run("split", chop=False, batch=2)
