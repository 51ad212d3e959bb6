"""Loss functions — parity surface with ``models/losses.py``.

The train step consumes plain functions; ``init_loss`` returns the
pixel-loss callable keyed by the same names ('l1'/'l2'), and
``MultipleLoss`` is the weighted-sum combinator (unused by the main path
in the reference but part of its public surface)."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


_LOSSES = {"l1": l1_loss, "l2": l2_loss}


def init_loss(name: str) -> Callable:
    if name not in _LOSSES:
        raise ValueError(f"unknown loss {name!r}; have {sorted(_LOSSES)}")
    return _LOSSES[name]


class MultipleLoss:
    """Weighted sum of losses (reference ``MultipleLoss``, losses.py:4-14)."""

    def __init__(self, losses: Sequence[Callable], weight: Optional[Sequence[float]] = None):
        self.losses = list(losses)
        self.weight = list(weight) if weight else [1.0 / len(self.losses)] * len(self.losses)

    def __call__(self, pred, target):
        total = 0.0
        for w, loss in zip(self.weight, self.losses):
            total = total + w * loss(pred, target)
        return total
