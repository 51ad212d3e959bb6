"""Train state: params + Adam optimizer + epoch/iteration counters.

Checkpoint-content parity with the reference (``models/ELD_model.py:
516-523``: netG params, optimizer state, epoch, iterations) in a single
flax ``TrainState`` pytree.

The learning rate is an *injected hyperparameter* (optax.inject_hyperparams)
so the reference's manual LR stepping (``engine.set_learning_rate``,
1e-4 -> 5e-5@100 -> 1e-5@180, ``train_syn.py:99-105``) is a pure pytree
update — no recompilation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray        # iteration counter
    epoch: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(params=new_params, opt_state=new_opt_state, step=self.step + 1)


def make_optimizer(lr: float = 1e-4, beta1: float = 0.9, weight_decay: float = 0.0):
    """Adam(lr, betas=(beta1, 0.999), weight_decay) — reference defaults
    (``models/ELD_model.py:400-403``, ``options/eld/train_options.py``)."""

    def build(learning_rate):
        if weight_decay:
            return optax.adamw(learning_rate, b1=beta1, b2=0.999, weight_decay=weight_decay)
        return optax.adam(learning_rate, b1=beta1, b2=0.999)

    return optax.inject_hyperparams(build)(learning_rate=lr)


def create_train_state(model, key, sample_shape, lr=1e-4, beta1=0.9, weight_decay=0.0):
    x = jnp.zeros(sample_shape, jnp.float32)
    variables = model.init(key, x)
    params = variables["params"] if "params" in variables else variables
    tx = make_optimizer(lr, beta1, weight_decay)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        tx=tx,
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Functional LR override (parity with ``Engine.set_learning_rate``)."""

    def _set(os):
        if hasattr(os, "hyperparams") and "learning_rate" in os.hyperparams:
            hp = dict(os.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return os._replace(hyperparams=FrozenDict(hp) if isinstance(os.hyperparams, FrozenDict) else hp)
        return os

    return state.replace(opt_state=_set(state.opt_state))


def get_learning_rate(state: TrainState) -> float:
    os = state.opt_state
    if hasattr(os, "hyperparams"):
        return float(os.hyperparams["learning_rate"])
    raise AttributeError("optimizer has no injected learning_rate")


# single-sourced in models/netutils (re-exported here for train-side callers)
from eld_tpu.models.netutils import param_count  # noqa: E402,F401
