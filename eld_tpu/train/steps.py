"""Functional train/eval steps, mesh-aware.

The flagship path is the *fused synthetic-noise train step*: clean patches
stream to the device once; noise-parameter sampling, physics noise
synthesis, U-Net forward/backward, and Adam all run inside ONE jitted
program, data-parallel over the mesh's ``data`` axis.  This replaces the
reference's CPU DataLoader-worker noise loop (``train_syn.py:78-80`` +
``noise.py:148-170``) — the north-star fusion in BASELINE.json.

Loss parity: L1 or L2 pixel loss (``models/losses.py:25-38``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from eld_tpu.noise.model import synthesize
from eld_tpu.noise.params import CameraParamsBank, sample_params_batch
from eld_tpu.parallel.mesh import DATA_AXIS


def pixel_loss(pred, target, kind: str = "l1"):
    from eld_tpu.models.losses import init_loss

    return init_loss(kind)(pred, target)


# noise_impl="auto" crossover, measured on 1x v5e (BASELINE.md "Round-5
# large-batch noise-impl crossover"): jnp noise FUSES into the train
# program and wins at per-device batch <= 16 (+4.5% @16, +9.1% @8), the
# fused Pallas kernel's VPU schedule wins from 32 up (+1.3% @32, +4.7%
# @64, +11.7% @128) where the per-pixel sampling math dominates the step.
PALLAS_NOISE_MIN_BATCH = 32


def _auto_pallas_noise(clean_shape, mesh=None) -> bool:
    """The batch-aware half of the ``noise_impl="auto"`` gate.

    Pallas needs a TPU backend and lane-aligned rows; given those, pick it
    only at large PER-DEVICE batch (the kernel runs per data shard under a
    mesh), where the round-5 crossover map shows it beating the fused-into-
    the-program jnp lowering.  Gate history: r1 jnp, r2 pallas-on-TPU, r5
    jnp at operating points / pallas at large batch — each flip measured
    (`bench_variants --modes gate,peak`), each recorded in BASELINE.md.
    """
    n, h, w, c = clean_shape
    if mesh is not None and DATA_AXIS in mesh.shape:
        n = n // mesh.shape[DATA_AXIS]
    if n < PALLAS_NOISE_MIN_BATCH or (w * c) % 128 or h % 8:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def make_train_step(
    model,
    loss: str = "l1",
    noise_model: Optional[str] = None,
    bank: Optional[CameraParamsBank] = None,
    k_mode: str = "overridden",
    mesh=None,
    donate: bool = True,
    noise_impl: str = "auto",
    mesh_donate: bool = False,
):
    """Build the jitted train step.

    If ``noise_model`` is set the step takes {"clean": (N,H,W,C)} batches
    and synthesizes the noisy input on-device; otherwise it takes
    {"input", "target"} paired batches (the ``train_real.py`` path).

    noise_impl: "auto" (batch-aware since the round-5 crossover map: jnp
    at per-device batch < 32, the fused Pallas kernel from 32 up on TPU —
    see ``_auto_pallas_noise``), "pallas" (the fused kernel; needs TPU +
    lane-aligned rows), or "jnp".

    With ``mesh`` the step is jitted with explicit shardings: batch over
    ``data``, state replicated — XLA inserts the gradient psum over ICI.
    ``donate`` only applies to the no-mesh path; ``mesh_donate`` opts the
    mesh path into state donation — a benchmark-only knob for re-measuring
    the donation-under-mesh compile blowup (see the gate note below), NOT
    for production use.
    """

    synthetic = noise_model is not None
    if synthetic and bank is None:
        raise ValueError("synthetic training needs a CameraParamsBank")

    def _synthesize(key, clean, nparams):
        # auto = batch-aware (see _auto_pallas_noise): jnp fuses into the
        # train program and wins at operating-point batches (8/16); the
        # Pallas kernel wins from per-device batch 32 up, where the
        # per-pixel sampling math dominates.  "pallas"/"jnp" stay as
        # explicit opt-ins; re-measure via `bench_variants --modes
        # gate,peak` (history in BASELINE.md).
        use_pallas = noise_impl == "pallas" or (
            noise_impl == "auto" and _auto_pallas_noise(clean.shape, mesh))
        if not use_pallas:
            return synthesize(key, clean, nparams, model=noise_model, clip=True)

        from eld_tpu.noise.kernels import synthesize_pallas

        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
        if mesh is None:
            return synthesize_pallas(seed, clean, nparams, model=noise_model)

        # under a mesh the kernel runs per data-shard via shard_map with a
        # distinct seed per shard (replicated across the spatial axis)
        from jax import shard_map

        def local_syn(seed, clean_l, nparams_l):
            s = seed + jax.lax.axis_index(DATA_AXIS) * 7919
            return synthesize_pallas(s, clean_l, nparams_l, model=noise_model)

        return shard_map(
            local_syn,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )(seed, clean, nparams)

    def _to_f32(x):
        """Accept uint16/uint8 batches (halves/quarters host->device traffic;
        see CleanPatchDataset(device_normalize=True)) — normalization runs
        on device with the same reciprocal constants as PatchStore."""
        if x.dtype == jnp.uint16:
            return x.astype(jnp.float32) * jnp.float32(1.0 / 65535.0)
        if x.dtype == jnp.uint8:
            return x.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        return x

    def step(state, batch, key):
        if synthetic:
            clean = _to_f32(batch["clean"])
            k_params, k_apply = jax.random.split(key)
            nparams = sample_params_batch(k_params, bank, clean.shape[0], k_mode=k_mode)
            noisy = _synthesize(k_apply, clean, nparams)
            target = clean
        else:
            noisy = _to_f32(batch["input"])
            target = _to_f32(batch["target"])

        def loss_fn(params):
            pred = model.apply({"params": params}, noisy)
            return pixel_loss(pred, target, loss)

        loss_val, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"Pixel": loss_val}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(DATA_AXIS))
    batch_sh = {"clean": batched} if synthetic else {"input": batched, "target": batched}
    # No donation under a mesh: buffer aliasing across pjit+shard_map blows
    # XLA compile time up ~15x (188s vs 12s, re-measured on jax 0.9.0/v5e)
    # for a ~190MB saving at this model size.
    #
    # NOTE for callers: pass inputs already committed to this mesh's
    # shardings (prefetch_to_device does this for batches; device_put the
    # state/key once). Uncommitted inputs get re-placed on EVERY call —
    # harmless on a direct-attached TPU, ~2000ms/step through this rig's
    # 25MB/s tunnel.
    return jax.jit(
        step,
        in_shardings=(repl, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if mesh_donate else (),
    )


def _augment_batch(key, *imgs):
    """Per-sample joint random flip/flip/transpose on (N,H,W,C) batches.

    Device-side equivalent of the reference's per-patch augmentation
    (``dataset/sid_dataset.py:137-145``): three independent coin flips per
    sample — H-flip, W-flip, and (square patches only) transpose — applied
    jointly to all arrays.  Packed-CFA semantics match the reference,
    which flips/transposes the packed planes without channel reorder."""
    kf0, kf1, kt = jax.random.split(key, 3)
    n = imgs[0].shape[0]
    m0 = jax.random.bernoulli(kf0, shape=(n, 1, 1, 1))
    m1 = jax.random.bernoulli(kf1, shape=(n, 1, 1, 1))
    out = [jnp.where(m0, jnp.flip(x, 1), x) for x in imgs]
    out = [jnp.where(m1, jnp.flip(x, 2), x) for x in out]
    if imgs[0].shape[1] == imgs[0].shape[2]:
        mt = jax.random.bernoulli(kt, shape=(n, 1, 1, 1))
        out = [jnp.where(mt, jnp.transpose(x, (0, 2, 1, 3)), x) for x in out]
    return out[0] if len(out) == 1 else tuple(out)


def make_train_scan(
    model,
    loss: str = "l1",
    noise_model: Optional[str] = None,
    bank: Optional[CameraParamsBank] = None,
    k_mode: str = "overridden",
    batch: int = 16,
    steps_per_call: int = 10,
    augment: bool = True,
    mesh=None,
    donate: bool = True,
    noise_impl: str = "auto",
):
    """K fused train steps per dispatch over a device-resident patch pool.

    ``make_train_step`` launches one XLA program per optimizer step; through
    a high-dispatch-latency link (this rig's tunneled TPU) the per-launch
    round-trip is a measurable fraction of a ~50 ms step, and on any TPU it
    costs host->device key/batch transfers per step.  This driver moves the
    WHOLE inner loop on device: per-step patch picks from a device-resident
    clean pool, per-sample flip/transpose augmentation, physics-noise
    synthesis, forward/backward, and Adam — ``steps_per_call`` iterations in
    ONE ``lax.scan``-compiled launch.

    This is the TPU-native shape of the reference's whole training recipe
    (``train_syn.py:100-113``): the SID clean patch set (1288 x 512^2 x 4ch
    u16 ~ 2.7 GB) fits in a v5e's HBM, so an entire synthetic-training epoch
    needs zero host round-trips.  Pass the pool as uint16 to halve its HBM
    footprint — normalization runs on device.

    Returns ``fn(state, pool, key) -> (state, metrics)`` where ``pool`` is
    ``{"clean": (P,H,W,C)}`` for synthetic training or ``{"input", "target"}``
    (same leading P) for the paired ``train_real.py`` path.  Metrics carry
    the mean and final loss of the K steps.
    """
    synthetic = noise_model is not None
    if synthetic and bank is None:
        raise ValueError("synthetic training needs a CameraParamsBank")

    def _to_f32(x):
        if x.dtype == jnp.uint16:
            return x.astype(jnp.float32) * jnp.float32(1.0 / 65535.0)
        if x.dtype == jnp.uint8:
            return x.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        return x

    def _synthesize(key, clean, nparams):
        # auto = batch-aware (see make_train_step / _auto_pallas_noise);
        # the scan path synthesizes per-step (batch,H,W,C) slices, so the
        # same per-device-batch crossover applies
        use_pallas = noise_impl == "pallas" or (
            noise_impl == "auto" and _auto_pallas_noise(clean.shape, mesh))
        if not use_pallas:
            return synthesize(key, clean, nparams, model=noise_model, clip=True)
        from eld_tpu.noise.kernels import synthesize_pallas

        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
        if mesh is None:
            return synthesize_pallas(seed, clean, nparams, model=noise_model)
        from jax import shard_map

        def local_syn(seed, clean_l, nparams_l):
            s = seed + jax.lax.axis_index(DATA_AXIS) * 7919
            return synthesize_pallas(s, clean_l, nparams_l, model=noise_model)

        return shard_map(
            local_syn, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS), check_vma=False,
        )(seed, clean, nparams)

    def _constrain(x):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(DATA_AXIS)))

    def multi(state, pool, key):
        def body(state, k):
            k_pick, k_aug, k_params, k_apply = jax.random.split(k, 4)

            def pick(pool_arr):
                # paired pools share k_pick -> identical indices, keeping
                # input/target rows aligned (pools must be equal length)
                idx = jax.random.randint(k_pick, (batch,), 0, pool_arr.shape[0])
                return _constrain(_to_f32(pool_arr[idx]))

            if synthetic:
                clean = pick(pool["clean"])
                if augment:
                    clean = _augment_batch(k_aug, clean)
                nparams = sample_params_batch(k_params, bank, batch, k_mode=k_mode)
                noisy = _synthesize(k_apply, clean, nparams)
                target = clean
            else:
                noisy = pick(pool["input"])
                target = pick(pool["target"])
                if augment:
                    noisy, target = _augment_batch(k_aug, noisy, target)

            def loss_fn(params):
                pred = model.apply({"params": params}, noisy)
                return pixel_loss(pred, target, loss)

            loss_val, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads), loss_val

        keys = jax.random.split(key, steps_per_call)
        state, losses = jax.lax.scan(body, state, keys)
        return state, {"Pixel": losses.mean(), "PixelLast": losses[-1]}

    if mesh is None:
        return jax.jit(multi, donate_argnums=(0,) if donate else ())
    repl = NamedSharding(mesh, P())
    pool_sh = jax.tree_util.tree_map(lambda _: repl, {"clean": 0} if synthetic
                                     else {"input": 0, "target": 0})
    return jax.jit(multi, in_shardings=(repl, pool_sh, repl),
                   out_shardings=(repl, repl))


def make_eval_forward(model, mesh=None, chop: bool = False):
    """Jitted inference: (params, x) -> pred; optional 4-tile chop.

    The no-chop path edge-pads H/W up to the arch's spatial alignment and
    crops back, so full frames that are not alignment-multiples (the SID
    1424x2128 geometry is 16- but not 32-aligned, and unet_s2d needs 32)
    run instead of failing in the decoder concats.  The branch resolves at
    trace time — already-aligned inputs compile to the bare forward."""
    from eld_tpu.ops.chop import forward_chop

    # tile geometry must honor the arch's own spatial alignment
    # (unet_s2d needs 32; the chop default of 16 would hand its decoder
    # unconcatenatable halves)
    base = model.alignment() if hasattr(model, "alignment") else 16

    def fwd(params, x):
        apply_fn = lambda t: model.apply({"params": params}, t)
        if chop:
            return forward_chop(apply_fn, x, base=base)
        h, w = x.shape[1], x.shape[2]
        hp, wp = -(-h // base) * base, -(-w // base) * base
        if (hp, wp) == (h, w):
            return apply_fn(x)
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                    mode="edge")
        return apply_fn(x)[:, :h, :w]

    if mesh is None:
        return jax.jit(fwd)
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(fwd, in_shardings=(repl, batched), out_shardings=batched)
