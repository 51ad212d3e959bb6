"""Checkpointing: save/load {params, opt_state, epoch, iterations}.

Content parity with the reference (``models/ELD_model.py:516-523``) and
the same on-disk naming scheme so tooling translates directly
(``models/base_model.py:55-66``):

    model_<epoch:03d>_<iters:08d>.ckpt    numbered snapshots
    model_latest.ckpt                      every-epoch rolling save
    model_best_<key>_<name>.ckpt           best-on-eval save

Uses orbax-checkpoint (async-capable, multi-host safe) with the discovery
helper mirroring ``util/util.py:37-51`` (``get_model_list``).
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as onp
import orbax.checkpoint as ocp

_NUMBERED = re.compile(r"model_(\d{3,})_(\d{8,})\.ckpt$")

_ASYNC = None


def _ckptr():
    return ocp.PyTreeCheckpointer()


def _async_ckptr():
    global _ASYNC
    if _ASYNC is None:
        import atexit

        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        atexit.register(_ASYNC.wait_until_finished)
    return _ASYNC


def wait_for_saves():
    """Block until all in-flight async checkpoint writes land."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save_checkpoint(save_dir: str, state, label: Optional[str] = None,
                    async_: bool = False):
    """Save a TrainState. label=None -> numbered name from state counters.

    async_=True overlaps the write with subsequent training (the
    fault-tolerance upgrade SURVEY.md §5 calls for over the reference's
    synchronous torch.save); call wait_for_saves() before reading back.
    """
    os.makedirs(save_dir, exist_ok=True)
    epoch = int(state.epoch)
    iters = int(state.step)
    name = f"model_{label}.ckpt" if label else f"model_{epoch:03d}_{iters:08d}.ckpt"
    path = os.path.abspath(os.path.join(save_dir, name))
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "epoch": epoch,
        "iterations": iters,
    }
    if async_:
        ckptr = _async_ckptr()
        ckptr.wait_until_finished()  # at most one write in flight per name
        ckptr.save(path, payload, force=True)
    else:
        _ckptr().save(path, payload, force=True)
    return path


def find_checkpoint(save_dir: str, epoch: Optional[int] = None) -> Optional[str]:
    """Discovery: numbered checkpoint for ``epoch``, else the newest
    numbered one, else model_latest (mirrors get_model_list semantics)."""
    if not os.path.isdir(save_dir):
        return None
    numbered = []
    for fn in os.listdir(save_dir):
        m = _NUMBERED.search(fn)
        if m:
            numbered.append((int(m.group(1)), int(m.group(2)), fn))
    if epoch is not None:
        hits = [t for t in numbered if t[0] == epoch]
        if hits:
            return os.path.join(save_dir, sorted(hits)[-1][2])
        return None
    if numbered:
        return os.path.join(save_dir, sorted(numbered)[-1][2])
    latest = os.path.join(save_dir, "model_latest.ckpt")
    return latest if os.path.exists(latest) else None


def restore_checkpoint(path: str, state):
    """Restore into an existing TrainState template (shapes/dtypes from it)."""
    template = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "epoch": 0,
        "iterations": 0,
    }
    payload = _ckptr().restore(os.path.abspath(path), item=template)
    import jax.numpy as jnp

    return state.replace(
        params=payload["params"],
        opt_state=payload["opt_state"],
        epoch=jnp.asarray(payload["epoch"], jnp.int32),
        step=jnp.asarray(payload["iterations"], jnp.int32),
    )


def restore_params(path: str, params_template):
    """Params-only restore (eval flows that never build an optimizer).

    Reads only {params, epoch, iterations} from disk — the stored
    opt_state (~2x params bytes for Adam) is never deserialized.  The
    template's tree structure and per-leaf shapes are validated against
    the checkpoint's metadata first, with a per-leaf diagnostic on
    mismatch (orbax's own structure error is opaque)."""
    path = os.path.abspath(path)
    ckptr = _ckptr()

    def _paths(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(kp): leaf for kp, leaf in flat}

    meta = ckptr.metadata(path).item_metadata.tree
    for key in ("params", "epoch", "iterations"):
        if key not in meta:
            raise ValueError(f"{path}: not an eld_tpu checkpoint (no '{key}' entry)")
    stored = _paths(meta["params"])
    tmpl_params = jax.device_get(params_template)
    wanted = _paths(tmpl_params)
    if set(stored) != set(wanted):
        missing = sorted(set(wanted) - set(stored))
        extra = sorted(set(stored) - set(wanted))
        raise ValueError(
            f"{path}: params tree mismatch — template leaves missing from "
            f"checkpoint: {missing or 'none'}; checkpoint leaves not in "
            f"template: {extra or 'none'}")
    for k, leaf in wanted.items():
        t_shape = tuple(getattr(leaf, "shape", ()))
        s_shape = tuple(stored[k].shape or ())
        if s_shape != t_shape:
            raise ValueError(
                f"{path}: checkpoint leaf {k} shape {s_shape} != template {t_shape}")

    item = {"params": tmpl_params, "epoch": 0, "iterations": 0}
    restore_args = jax.tree_util.tree_map(lambda _: ocp.RestoreArgs(), item)
    payload = ckptr.restore(path, item=item, transforms={},
                            restore_args=restore_args)
    params = jax.tree_util.tree_map(onp.asarray, payload["params"])
    return params, int(payload["epoch"]), int(payload["iterations"])
