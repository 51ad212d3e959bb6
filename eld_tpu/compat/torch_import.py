"""Import reference PyTorch checkpoints into eld_tpu Flax params.

The reference ships pretrained ``.pt`` checkpoints with
``{'netG': state_dict, 'opt_g': ..., 'epoch': ..., 'iterations': ...}``
(``models/ELD_model.py:516-523``).  This module maps the torch
``UNetSeeInDark`` parameter names/layouts onto our Flax tree so reference
users can evaluate released models on TPU without retraining.

Layout transforms:
  * Conv2d weight (O, I, kh, kw)          -> Flax Conv kernel (kh, kw, I, O)
  * ConvTranspose2d weight (I, O, kh, kw) -> Flax ConvTranspose kernel
    (kh, kw, I, O) with the spatial taps flipped: torch's ConvTranspose2d
    is gradient-of-conv while lax.conv_transpose is a fractionally-strided
    conv, which differ by a spatial mirror of the kernel (exactness
    verified in tests/test_torch_import.py).
"""

from __future__ import annotations

from typing import Tuple

import numpy as onp

# torch layer name -> (flax module path, kind)
_UNET_MAP = {
    "conv1_1": ("enc0/Conv_0", "conv"),
    "conv1_2": ("enc0/Conv_1", "conv"),
    "conv2_1": ("enc1/Conv_0", "conv"),
    "conv2_2": ("enc1/Conv_1", "conv"),
    "conv3_1": ("enc2/Conv_0", "conv"),
    "conv3_2": ("enc2/Conv_1", "conv"),
    "conv4_1": ("enc3/Conv_0", "conv"),
    "conv4_2": ("enc3/Conv_1", "conv"),
    "conv5_1": ("enc4/Conv_0", "conv"),
    "conv5_2": ("enc4/Conv_1", "conv"),
    "upv6": ("ConvTranspose_0", "convT"),
    "conv6_1": ("dec3/Conv_0", "conv"),
    "conv6_2": ("dec3/Conv_1", "conv"),
    "upv7": ("ConvTranspose_1", "convT"),
    "conv7_1": ("dec2/Conv_0", "conv"),
    "conv7_2": ("dec2/Conv_1", "conv"),
    "upv8": ("ConvTranspose_2", "convT"),
    "conv8_1": ("dec1/Conv_0", "conv"),
    "conv8_2": ("dec1/Conv_1", "conv"),
    "upv9": ("ConvTranspose_3", "convT"),
    "conv9_1": ("dec0/Conv_0", "conv"),
    "conv9_2": ("dec0/Conv_1", "conv"),
    "conv10_1": ("Conv_0", "conv"),
}


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return onp.asarray(t)


def convert_unet_state_dict(torch_sd: dict) -> dict:
    """torch UNetSeeInDark state_dict -> nested Flax params dict."""
    params: dict = {}
    for tname, (fpath, kind) in _UNET_MAP.items():
        w = _to_numpy(torch_sd[f"{tname}.weight"]).astype(onp.float32)
        if kind == "conv":
            kernel = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        else:
            # IOHW -> HW(in,out), spatially flipped (see module docstring)
            kernel = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
        node = params
        parts = fpath.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = node.setdefault(parts[-1], {})
        leaf["kernel"] = kernel
        bkey = f"{tname}.bias"
        if bkey in torch_sd:
            leaf["bias"] = _to_numpy(torch_sd[bkey]).astype(onp.float32)
    return params


def load_torch_checkpoint(path: str, params_template=None) -> Tuple[dict, int, int]:
    """Load a reference .pt checkpoint -> (flax_params, epoch, iterations).

    If ``params_template`` is given, the converted tree is shape-checked
    against it leaf by leaf.
    """
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["netG"] if "netG" in state else state
    params = convert_unet_state_dict(sd)
    epoch = int(state.get("epoch", 0)) if isinstance(state, dict) else 0
    iters = int(state.get("iterations", 0)) if isinstance(state, dict) else 0

    if params_template is not None:
        import jax

        want = jax.tree_util.tree_map(lambda x: x.shape, params_template)
        got = jax.tree_util.tree_map(lambda x: x.shape, params)
        flat_w = jax.tree_util.tree_leaves_with_path(want)
        flat_g = dict(jax.tree_util.tree_leaves_with_path(got))
        for kpath, shape in flat_w:
            if kpath not in flat_g:
                raise KeyError(f"converted checkpoint missing {kpath}")
            if flat_g[kpath] != shape:
                raise ValueError(f"shape mismatch at {kpath}: {flat_g[kpath]} != {shape}")
    return params, epoch, iters


def export_torch_state_dict(params: dict) -> dict:
    """Inverse conversion: Flax params -> torch-layout state_dict (numpy
    values), for users moving trained weights back to the reference."""
    out = {}
    for tname, (fpath, kind) in _UNET_MAP.items():
        node = params
        for p in fpath.split("/"):
            node = node[p]
        k = onp.asarray(node["kernel"])
        if kind == "conv":
            out[f"{tname}.weight"] = k.transpose(3, 2, 0, 1)
        else:
            out[f"{tname}.weight"] = k.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1].copy()
        if "bias" in node:
            out[f"{tname}.bias"] = onp.asarray(node["bias"])
    return out
