"""Network utilities — parity with the reference's ``models/networks.py``:
weight-init variants, parameter counting, receptive-field calculation."""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax


def weight_init(init_type: str = "normal", gain: float = 0.02):
    """Kernel initializer factory keyed by the reference's names
    (``networks.py:58-71``): normal / xavier / kaiming / orthogonal.
    The default training path skips custom init (EDSR-style), matching
    ``ELD_model.py:393``."""
    if init_type == "normal":
        return nn.initializers.normal(stddev=gain)
    if init_type == "xavier":
        return nn.initializers.xavier_normal()
    if init_type == "kaiming":
        return nn.initializers.kaiming_normal()
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=gain)
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def print_network(params, name: str = "net"):
    n = param_count(params)
    print(f"[i] {name}: {n:,} parameters")
    return n


def receptive_field(layers: Sequence[Tuple[int, int]]) -> Tuple[int, float, float]:
    """(kernel, stride) per layer -> (rf, effective_stride, effective_pad),
    the recurrence from ``networks.py:112-127``."""
    rf, stride, pad = 1, 1.0, 0.0
    for k, s in layers:
        rf = rf + (k - 1) * stride
        pad = pad + ((k - 1) / 2) * stride
        stride = stride * s
    return rf, stride, pad


def unet_receptive_field() -> int:
    """Receptive field of the SID U-Net encoder path (informational)."""
    layers = []
    for _ in range(5):
        layers += [(3, 1), (3, 1), (2, 2)]
    layers = layers[:-1]  # bottom level has no pool
    return receptive_field(layers)[0]
