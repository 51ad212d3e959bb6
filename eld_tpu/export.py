"""Serving export: self-contained StableHLO denoiser artifacts.

The reference has no deployment story — running its denoiser requires the
full repo plus torch to rebuild the module and load a ``.pt`` state dict
(``models/ELD_model.py:492-514``).  The TPU-native redesign bakes the
trained network into ONE portable artifact via ``jax.export``:

  * the trained parameters are closed over, so they become constants in
    the StableHLO module — the artifact is self-contained (no eld_tpu,
    no flax, no checkpoint needed at serving time, only jax);
  * lowered for BOTH tpu and cpu backends in one artifact, so the same
    file serves on a TPU pod and on a CPU canary;
  * the batch dimension is symbolic, so one export serves any batch size;
  * jax.export's calling-convention versioning guards forward compat.

Artifact format (``.eldx``): a zip with ``model.stablehlo`` (the
serialized Exported) and ``meta.json`` (arch, geometry, dtypes, param
count) for inspection without deserializing.

Eval-protocol parity: ``chop=True`` bakes the reference's 4-tile chopped
forward (``models/ELD_model.py:434-467`` semantics via ``ops/chop``) into
the artifact, so full-frame serving matches the released eval protocol.
"""

from __future__ import annotations

import json
import zipfile
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

ARTIFACT_VERSION = 1
_BLOB = "model.stablehlo"
_META = "meta.json"


def _is_qleaf(node) -> bool:
    return (isinstance(node, tuple) and len(node) == 2
            and getattr(node[0], "dtype", None) == jnp.int8)


def quantize_params(params, keep_f32=("Conv_0",)):
    """Weight-only symmetric int8: conv/dense kernels get per-output-
    channel scales (last axis is out-channels in flax HWIO/HWOI layouts);
    1-D leaves (biases — a negligible byte fraction) stay f32.

    Kernels whose TOP-LEVEL module name is in ``keep_f32`` also stay
    f32: by default the output projection (``Conv_0`` at the top of
    both U-Net topologies — interior ``DecBlock_*/Conv_0`` children are
    deliberately NOT matched), whose quantization error lands directly
    in the output pixels — keeping it f32 costs ~0.1% of the bytes and
    halves the worst-case denoised-PSNR delta (tests/test_export.py::
    test_export_int8_psnr_gate).

    Returns a pytree whose kernel leaves are ``(int8_values, f32_scale)``
    tuples; ``dequantize_params`` restores f32.  Serving artifacts baked
    from the quantized tree carry int8 constants — ~4x smaller .eldx."""
    from jax.tree_util import DictKey, tree_map_with_path

    def q(path, x):
        skip = (len(path) > 0 and isinstance(path[0], DictKey)
                and str(path[0].key) in keep_f32)
        if x.ndim < 2 or skip:
            return x
        amax = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1)),
                       keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
        qx = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        return (qx, scale)

    return tree_map_with_path(q, params)


def dequantize_params(qparams):
    """Inverse of ``quantize_params`` (up to the int8 rounding)."""
    return jax.tree.map(
        lambda n: n[0].astype(jnp.float32) * n[1] if _is_qleaf(n) else n,
        qparams, is_leaf=_is_qleaf)


def _forward(model, params, chop: bool, quantize: Optional[str] = None):
    from eld_tpu.ops.chop import forward_chop

    if quantize == "int8":
        params = quantize_params(params)
    elif quantize is not None:
        raise ValueError(f"unknown quantize mode {quantize!r} "
                         "(supported: 'int8')")

    def fn(x):
        p = dequantize_params(params) if quantize else params
        apply_fn = lambda t: model.apply({"params": p}, t)
        out = forward_chop(apply_fn, x) if chop else apply_fn(x)
        return out.astype(jnp.float32)

    return fn


def export_denoiser(
    model,
    params,
    height: int,
    width: int,
    channels: int = 4,
    *,
    chop: bool = False,
    platforms: Tuple[str, ...] = ("tpu", "cpu"),
    symbolic_batch: bool = True,
    quantize: Optional[str] = None,
):
    """Lower the denoiser to a serialized StableHLO blob (bytes).

    ``height``/``width`` are static (XLA needs static spatial shapes; use
    the serving frame geometry, e.g. 1424x2128 for SID Sony full frames).
    The batch dimension is symbolic unless ``symbolic_batch=False``.
    ``quantize='int8'`` bakes weight-only per-channel int8 constants with
    an in-graph dequantize (~4x smaller artifact; quality delta measured
    in tests/test_export.py).
    """
    from jax import export as jexport

    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = 1
    spec = jax.ShapeDtypeStruct((b, height, width, channels), jnp.float32)
    fn = jax.jit(_forward(model, params, chop, quantize))
    exported = jexport.export(fn, platforms=tuple(platforms))(spec)
    return exported.serialize()


def save_denoiser(
    path: str,
    model,
    params,
    height: int,
    width: int,
    channels: int = 4,
    *,
    chop: bool = False,
    platforms: Tuple[str, ...] = ("tpu", "cpu"),
    symbolic_batch: bool = True,
    quantize: Optional[str] = None,
    extra_meta: Optional[dict] = None,
) -> dict:
    """Export + write a ``.eldx`` artifact; returns the metadata dict."""
    blob = export_denoiser(
        model, params, height, width, channels,
        chop=chop, platforms=platforms, symbolic_batch=symbolic_batch,
        quantize=quantize,
    )
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    meta = {
        "format": "eldx",
        "version": ARTIFACT_VERSION,
        "jax_version": jax.__version__,
        "height": height,
        "width": width,
        "channels": channels,
        "chop": chop,
        "platforms": list(platforms),
        "symbolic_batch": symbolic_batch,
        "quantize": quantize,
        "param_count": n_params,
        **(extra_meta or {}),
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META, json.dumps(meta, indent=1))
        z.writestr(_BLOB, blob)
    return meta


def _check_meta(path: str, meta: dict) -> dict:
    if meta.get("format") != "eldx":
        raise ValueError(
            f"{path}: not an eldx artifact (format={meta.get('format')!r})")
    version = meta.get("version")
    if version != ARTIFACT_VERSION:
        raise ValueError(
            f"{path}: unsupported eldx artifact version {version!r} "
            f"(this eld_tpu reads version {ARTIFACT_VERSION})")
    return meta


def read_meta(path: str) -> dict:
    with zipfile.ZipFile(path) as z:
        return _check_meta(path, json.loads(z.read(_META).decode()))


def load_denoiser(path: str) -> Tuple[Callable[[Any], Any], dict]:
    """Load a ``.eldx`` artifact: returns (callable, meta).

    The callable maps a float32 (N, H, W, C) array to the denoised output;
    it needs only jax at call time (parameters live inside the module).
    """
    from jax import export as jexport

    with zipfile.ZipFile(path) as z:
        meta = _check_meta(path, json.loads(z.read(_META).decode()))
        exported = jexport.deserialize(bytearray(z.read(_BLOB)))
    return exported.call, meta
