import json, time
import jax, jax.numpy as jnp, numpy as onp
from eld_tpu.models import build_arch
from eld_tpu.train.steps import make_eval_forward

H, W = 1424, 2128
REPS, K = 6, 5

def median(xs):
    s = sorted(xs); n = len(s)
    return s[n//2] if n % 2 else 0.5*(s[n//2-1]+s[n//2])

def run(batch, reps=REPS):
    model = build_arch("unet", 4, 4, dtype=jnp.bfloat16, skip_mode="split")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,64,64,4)))["params"]
    fwd = make_eval_forward(model, chop=False)
    x = jnp.asarray(onp.random.default_rng(0).random((batch,H,W,4), dtype=onp.float32))
    t0 = time.perf_counter()
    float(fwd(params, x).sum())
    cs = time.perf_counter() - t0
    ws = []
    for _ in range(K):
        t0 = time.perf_counter()
        outs = [fwd(params, x) for _ in range(reps)]
        jax.block_until_ready(outs)
        ws.append(batch*reps/(time.perf_counter()-t0))
    med = median(ws)
    print(json.dumps({"batch": batch, "fps": round(med,2),
                      "mad": round(median([abs(w-med) for w in ws]),2),
                      "windows": [round(w,2) for w in ws],
                      "compile_s": round(cs,1)}), flush=True)

if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    for b in (4, 8, 16):
        try: run(b, reps=max(2, REPS//b))
        except Exception as e: print(json.dumps({"batch": b, "error": type(e).__name__}), flush=True)
