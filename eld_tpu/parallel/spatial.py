"""Spatially-sharded full-frame inference over the ``spatial`` mesh axis.

The reference scales past single-device memory with a 4-tile overlap chop
(``models/ELD_model.py:434-467``).  The TPU-native generalization shards
the image height across devices: each device runs the network on its own
H-slab plus an overlap window, and keeps only its own rows — the
"context parallelism" analog for a CNN (SURVEY.md §5).

Window semantics match the chop protocol exactly: windows are clamped at
the true frame borders (border devices see the real image edge, as chop's
corner-anchored tiles do), and the overlap (``halo``) is rounded up to the
network's alignment with the same >= 10 px minimum.  Heights that don't
divide the shard grid are edge-padded and cropped back.

Memory math: only the *input* frame is gathered per device (a few tens of
MB); the expensive intermediate activations (~100x larger) stay sharded.
The all-gather rides ICI; XLA inserts it from the shard_map spec.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from eld_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS


def spatial_halo(base: int = 16, min_shave: int = 10) -> int:
    """Overlap size: >= min_shave, rounded up to the network alignment
    (same arithmetic as the chop shave, ELD_model.py:438-442)."""
    return math.ceil(min_shave / base) * base


def make_spatial_forward(apply_fn, mesh, halo: int | None = None, base: int = 16):
    """Build a jitted forward that shards H over the ``spatial`` mesh axis.

    apply_fn: (params, (N, H', W, C)) -> (N, H', W, C') pure function.
    Returns fn(params, x) for x: (N, H, W, C); jit-cached once — reuse the
    returned function across calls.  ``base`` must be the network's
    spatial alignment (e.g. ``model.alignment()``).
    """
    s = mesh.shape[SPATIAL_AXIS]
    d = mesh.shape[DATA_AXIS]
    halo = spatial_halo(base) if halo is None else halo
    quantum = s * base

    def sharded(params, x):
        n, h, w, c = x.shape
        # edge-pad H up to the shard grid and W up to the net alignment
        # (cropped back below) — real SID/ELD frame dims (e.g. 1424x2128)
        # don't generally divide spatial*base
        hp = -(-h // quantum) * quantum
        wp = -(-w // base) * base
        if hp != h or wp != w:
            x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="edge")
        slab = hp // s
        win = min(hp, slab + 2 * halo)

        # batch rides the data axis when it divides it; otherwise (the
        # common full-frame batch-1 eval) it is replicated across data.
        batch_axis = DATA_AXIS if n % d == 0 else None

        def local(params_l, x_full):
            i = lax.axis_index(SPATIAL_AXIS)
            start = jnp.clip(i * slab - halo, 0, hp - win)
            window = lax.dynamic_slice_in_dim(x_full, start, win, axis=1)
            out = apply_fn(params_l, window)
            offset = i * slab - start
            return lax.dynamic_slice_in_dim(out, offset, slab, axis=1)

        out = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(batch_axis, None, None, None)),
            out_specs=P(batch_axis, SPATIAL_AXIS, None, None),
        )(params, x)
        return out[:, :h, :w]

    return jax.jit(sharded)
