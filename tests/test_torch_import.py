"""Torch checkpoint conversion parity.

Validates layer-layout mappings exactly, then full-network equivalence by
running the same weights through an independent functional-torch forward
of the published SID U-Net topology and through our Flax model.
"""

import numpy as onp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eld_tpu.compat.torch_import import (  # noqa: E402
    convert_unet_state_dict,
    export_torch_state_dict,
)
from eld_tpu.models.unet import UNetSeeInDark  # noqa: E402


def make_torch_state_dict(rng, cin=4, cout=4):
    """Random weights with the reference's names/shapes (Unet.py:11-46)."""
    widths = [32, 64, 128, 256, 512]
    sd = {}

    def conv(name, i, o, k):
        sd[f"{name}.weight"] = torch.from_numpy(
            rng.normal(0, 0.05, (o, i, k, k)).astype(onp.float32))
        sd[f"{name}.bias"] = torch.from_numpy(
            rng.normal(0, 0.05, (o,)).astype(onp.float32))

    def convT(name, i, o):
        sd[f"{name}.weight"] = torch.from_numpy(
            rng.normal(0, 0.05, (i, o, 2, 2)).astype(onp.float32))
        sd[f"{name}.bias"] = torch.from_numpy(
            rng.normal(0, 0.05, (o,)).astype(onp.float32))

    prev = cin
    for lvl, w in enumerate(widths, start=1):
        conv(f"conv{lvl}_1", prev, w, 3)
        conv(f"conv{lvl}_2", w, w, 3)
        prev = w
    for lvl, w in zip(range(6, 10), [256, 128, 64, 32]):
        convT(f"upv{lvl}", 2 * w, w)
        conv(f"conv{lvl}_1", 2 * w, w, 3)
        conv(f"conv{lvl}_2", w, w, 3)
    conv("conv10_1", 32, cout, 1)
    return sd


def torch_forward(sd, x):
    """Functional forward of the published topology (NCHW)."""
    lrelu = lambda t: torch.max(0.2 * t, t)
    c = lambda name, t, pad: lrelu(
        F.conv2d(t, sd[f"{name}.weight"], sd[f"{name}.bias"], padding=pad))

    skips = []
    t = x
    for lvl in range(1, 6):
        t = c(f"conv{lvl}_1", t, 1)
        t = c(f"conv{lvl}_2", t, 1)
        if lvl < 5:
            skips.append(t)
            t = F.max_pool2d(t, 2)
    for lvl in range(6, 10):
        t = F.conv_transpose2d(t, sd[f"upv{lvl}.weight"], sd[f"upv{lvl}.bias"], stride=2)
        t = torch.cat([t, skips[9 - lvl]], dim=1)
        t = c(f"conv{lvl}_1", t, 1)
        t = c(f"conv{lvl}_2", t, 1)
    return F.conv2d(t, sd["conv10_1.weight"], sd["conv10_1.bias"])


def test_full_network_parity(rng):
    sd = make_torch_state_dict(rng)
    x = rng.random((1, 32, 32, 4), dtype=onp.float32)

    with torch.no_grad():
        y_torch = torch_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    y_torch = y_torch.numpy().transpose(0, 2, 3, 1)

    params = jax.tree_util.tree_map(jnp.asarray, convert_unet_state_dict(sd))
    model = UNetSeeInDark(4, 4)
    y_flax = onp.asarray(model.apply({"params": params}, jnp.asarray(x)))

    onp.testing.assert_allclose(y_flax, y_torch, atol=2e-5)


def test_roundtrip_export(rng):
    sd = make_torch_state_dict(rng)
    params = convert_unet_state_dict(sd)
    back = export_torch_state_dict(params)
    for k in sd:
        onp.testing.assert_allclose(back[k], sd[k].numpy(), rtol=1e-6)


def test_template_shape_check(rng, tmp_path):
    sd = make_torch_state_dict(rng)
    state = {"netG": sd, "epoch": 200, "iterations": 257600}
    path = tmp_path / "model_200.pt"
    torch.save(state, path)

    from eld_tpu.compat.torch_import import load_torch_checkpoint

    model = UNetSeeInDark(4, 4)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)))["params"]
    params, epoch, iters = load_torch_checkpoint(str(path), template)
    assert epoch == 200 and iters == 257600
