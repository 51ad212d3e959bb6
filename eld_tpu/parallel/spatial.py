"""Spatially-sharded full-frame inference over the ``spatial`` mesh axis.

The reference scales past single-device memory with a 4-tile overlap chop
(``models/ELD_model.py:434-467``).  The TPU-native generalization shards
the image height across devices: each device runs the network on its own
H-slab plus an overlap window, and keeps only its own rows — the
"context parallelism" analog for a CNN (SURVEY.md §5).

Window semantics match the chop protocol exactly: windows are clamped at
the true frame borders (border devices see the real image edge, as chop's
corner-anchored tiles do), and the overlap (``halo``) is rounded up to the
network's 16-px alignment with the same >= 10 px minimum.

Memory math: only the *input* frame is gathered per device (a few tens of
MB); the expensive intermediate activations (~100x larger) stay sharded.
The all-gather rides ICI; XLA inserts it from the shard_map spec.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from eld_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS


def spatial_halo(h_local: int, base: int = 16, min_shave: int = 10) -> int:
    """Overlap size: >= min_shave, rounded so windows stay base-aligned
    (same arithmetic as the chop shave, ELD_model.py:438-442)."""
    shave = math.ceil(min_shave / base) * base
    return shave


def make_spatial_forward(apply_fn, mesh, halo: int | None = None, base: int = 16):
    """Build a jitted forward that shards H over the ``spatial`` mesh axis.

    apply_fn: (N, H', W, C) -> (N, H', W, C') pure function (e.g. a bound
    model apply). Returns fn(x) for x: (N, H, W, C) with H % (base*s) == 0.
    """
    s = mesh.shape[SPATIAL_AXIS]
    halo = spatial_halo(base) if halo is None else halo

    d = mesh.shape[DATA_AXIS]

    def sharded(x):
        n, h, w, c = x.shape
        if h % (s * base) != 0:
            raise ValueError(f"H={h} must be divisible by spatial size*{base}")
        # batch rides the data axis when it divides it; otherwise (the
        # common full-frame batch-1 eval) it is replicated across data.
        batch_axis = DATA_AXIS if n % d == 0 else None
        slab = h // s
        win = min(h, slab + 2 * halo)

        def local(x_full):
            # x_full: full (N, H, W, C) on every spatial member (gathered
            # by the in_spec P() below), slab selection is local.
            i = lax.axis_index(SPATIAL_AXIS)
            start = jnp.clip(i * slab - halo, 0, h - win)
            window = lax.dynamic_slice_in_dim(x_full, start, win, axis=1)
            out = apply_fn(window)
            offset = i * slab - start
            return lax.dynamic_slice_in_dim(out, offset, slab, axis=1)

        return shard_map(
            local,
            mesh=mesh,
            in_specs=P(batch_axis, None, None, None),
            out_specs=P(batch_axis, SPATIAL_AXIS, None, None),
        )(x)

    return jax.jit(sharded)
