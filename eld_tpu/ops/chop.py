"""Tiled ("chopped") full-frame inference.

The reference's memory workaround for full-resolution eval splits the frame
into 4 overlapping tiles, runs the net per tile sequentially, and stitches
the non-overlapping quadrants (``models/ELD_model.py:434-467``, used by all
released ELD eval runs via ``--chop``).

TPU-first redesign: the 4 tiles are equal-sized, so we stack them into one
batch of 4 and run a SINGLE forward — one XLA launch, MXU stays fed — then
stitch with static slices.  Tile arithmetic (shave >= 10 rounded up to the
net's 16-px alignment) is preserved exactly so outputs match the reference
protocol.  For frames too large even for 4 tiles on one core, see
``eld_tpu.parallel.spatial`` (halo-sharded multi-device eval).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def chop_geometry(h: int, w: int, base: int = 16, min_shave: int = 10):
    """Static tile geometry: returns (h_size, w_size, h_half, w_half)."""
    h_half, w_half = h // 2, w // 2
    shave_h = math.ceil(h_half / base) * base - h_half
    shave_w = math.ceil(w_half / base) * base - w_half
    if shave_h < min_shave:
        shave_h += base
    if shave_w < min_shave:
        shave_w += base
    hs, ws = h_half + shave_h, w_half + shave_w
    if hs > h or ws > w:
        # tiles would exceed the frame: corner anchoring then duplicates
        # tile 0 and the stitch slices go empty/ragged — refuse clearly
        raise ValueError(
            f"frame {h}x{w} is too small to 4-tile chop at base={base} "
            f"(tiles would be {hs}x{ws}); run the plain forward instead")
    return hs, ws, h_half, w_half


def forward_chop(apply_fn, x, base: int = 16, min_shave: int = 10):
    """4-tile chopped forward. apply_fn: (N,H,W,C)->(N,H,W,C'); x: (N,H,W,C).

    All shapes are static under jit (geometry computed from the Python ints
    of ``x.shape``), so this compiles to a single fused program.
    """
    n, h, w, c = x.shape
    hs, ws, hh, wh = chop_geometry(h, w, base, min_shave)

    tiles = jnp.stack(
        [
            x[:, 0:hs, 0:ws, :],
            x[:, 0:hs, w - ws : w, :],
            x[:, h - hs : h, 0:ws, :],
            x[:, h - hs : h, w - ws : w, :],
        ],
        axis=0,
    )  # (4, N, hs, ws, C)
    outs = apply_fn(tiles.reshape(4 * n, hs, ws, c))
    co = outs.shape[-1]
    outs = outs.reshape(4, n, hs, ws, co)

    top = jnp.concatenate(
        [outs[0][:, 0:hh, 0:wh, :], outs[1][:, 0:hh, ws - (w - wh) :, :]], axis=2
    )
    bot = jnp.concatenate(
        [outs[2][:, hs - (h - hh) :, 0:wh, :], outs[3][:, hs - (h - hh) :, ws - (w - wh) :, :]],
        axis=2,
    )
    return jnp.concatenate([top, bot], axis=1)
