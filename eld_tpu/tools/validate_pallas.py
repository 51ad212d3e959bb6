"""Hardware validation for the fused Pallas noise kernel.

Runs the statistical parity checks (Pallas vs jnp reference path) and a
micro-benchmark on the real TPU — the CPU CI mesh stubs the hardware
PRNG, so this is the authoritative check.

Usage:  python -m eld_tpu.tools.validate_pallas
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as onp

from eld_tpu.noise import load_camera_params, sample_params_batch, synthesize
from eld_tpu.noise.kernels import synthesize_pallas


def main():
    if jax.devices()[0].platform != "tpu":
        print("not on TPU; nothing to validate", file=sys.stderr)
        return 0  # benign skip, not a failure
    bank = load_camera_params()
    clean = jnp.asarray(
        onp.random.default_rng(0).random((8, 512, 512, 4), dtype=onp.float32))
    params = sample_params_batch(jax.random.PRNGKey(5), bank, 8)

    failures = 0
    for model in ("g", "pg", "Pg", "eld"):
        out = synthesize_pallas(42, clean, params, model=model)
        ref = synthesize(jax.random.PRNGKey(7), clean, params, model=model)
        e_p = onp.asarray(out - clean)
        e_r = onp.asarray(ref - clean)
        dmean = abs(e_p.mean() - e_r.mean())
        dstd = abs(e_p.std() / max(e_r.std(), 1e-9) - 1)
        ok = dmean < 5e-3 and dstd < 0.1
        failures += not ok
        print(f"{model:4s}: dmean={dmean:.2e} dstd={dstd:.2%} {'OK' if ok else 'FAIL'}")

    def bench(fn, *args, n=30):
        o = fn(*args)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / n * 1000

    f_jnp = jax.jit(lambda k, y: synthesize(
        k, y, sample_params_batch(k, bank, y.shape[0]), model="eld"))
    f_pal = jax.jit(lambda s, y: synthesize_pallas(
        s, y, sample_params_batch(jax.random.PRNGKey(5), bank, y.shape[0]), model="eld"))
    print(f"jnp path:    {bench(f_jnp, jax.random.PRNGKey(0), clean):6.2f} ms/batch8")
    print(f"pallas path: {bench(f_pal, 42, clean):6.2f} ms/batch8")
    return failures


def cli() -> int:
    """Console-script entry: discard main()'s return value (it is data
    for tests/importers, not an exit status — sys.exit(non-empty dict/
    list) would turn every success into exit code 1)."""
    main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
