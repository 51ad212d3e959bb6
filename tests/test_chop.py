"""Tiled (chopped) inference tests (reference: ELD_model.py:434-467)."""

import jax
import jax.numpy as jnp
import numpy as onp

from eld_tpu.ops.chop import chop_geometry, forward_chop


def test_geometry_matches_reference_arithmetic():
    # mirror the reference math for assorted sizes
    import math

    for (h, w) in [(512, 512), (1424, 2128), (100, 200), (1416, 2120)]:
        hs, ws, hh, wh = chop_geometry(h, w)
        h_half, w_half = h // 2, w // 2
        shave_h = math.ceil(h_half / 16) * 16 - h_half
        shave_w = math.ceil(w_half / 16) * 16 - w_half
        shave_h = shave_h if shave_h >= 10 else shave_h + 16
        shave_w = shave_w if shave_w >= 10 else shave_w + 16
        assert (hs, ws) == (h_half + shave_h, w_half + shave_w)
        assert (hh, wh) == (h_half, w_half)
        assert hs % 16 == 0 or h_half % 16 != 0  # tiles stay net-aligned when input is


def test_chop_exact_for_local_op(rng):
    """With a small-receptive-field op and shave >= RF, chop == direct."""
    x = jnp.asarray(rng.random((1, 96, 128, 4), dtype=onp.float32))
    kernel = jnp.ones((5, 5, 4, 4), jnp.float32) / (25 * 4)

    def conv(t):
        return jax.lax.conv_general_dilated(
            t, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    full = conv(x)
    chopped = forward_chop(conv, x)
    assert chopped.shape == full.shape
    onp.testing.assert_allclose(onp.asarray(chopped), onp.asarray(full), atol=1e-5)


def test_chop_identity():
    x = jnp.arange(1 * 64 * 96 * 4, dtype=jnp.float32).reshape(1, 64, 96, 4)
    out = forward_chop(lambda t: t, x)
    onp.testing.assert_array_equal(onp.asarray(out), onp.asarray(x))


def test_chop_under_jit(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 4), dtype=onp.float32))
    fn = jax.jit(lambda t: forward_chop(lambda u: u * 2.0, t))
    onp.testing.assert_allclose(onp.asarray(fn(x)), onp.asarray(x) * 2.0, rtol=1e-6)


def test_chop_honors_arch_alignment(rng):
    """make_eval_forward(chop=True) must tile at the ARCH's alignment:
    unet_s2d needs 32-px tiles (the chop default of 16 hands its decoder
    unconcatenatable halves at many geometries)."""
    from eld_tpu.models import build_arch
    from eld_tpu.train.steps import make_eval_forward

    m = build_arch("unet_s2d", 4, 4, base_width=8)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)))["params"]
    fwd = make_eval_forward(m, chop=True)
    x = jnp.asarray(rng.random((1, 172, 212, 4), dtype=onp.float32))
    assert fwd(p, x).shape == (1, 172, 212, 4)
    # exactness against the plain forward away from tile seams is
    # guaranteed by the chop protocol; check global closeness on an
    # aligned frame where chop==plain for this receptive field
    x2 = jnp.asarray(rng.random((1, 128, 128, 4), dtype=onp.float32))
    plain = make_eval_forward(m, chop=False)(p, x2)
    onp.testing.assert_allclose(onp.asarray(fwd(p, x2)),
                                onp.asarray(plain), atol=1e-5)


def test_nochop_pads_to_arch_alignment(rng):
    """make_eval_forward(chop=False) must run frames that are NOT
    alignment-multiples: the SID full frame (1424x2128) is 16- but not
    32-aligned, so unet_s2d under the no-chop serving default would
    otherwise die in its decoder concats (Engine.eval crop=False is
    exactly this path — eld-test-eld without --chop)."""
    from eld_tpu.models import build_arch
    from eld_tpu.train.steps import make_eval_forward

    m = build_arch("unet_s2d", 4, 4, base_width=8)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)))["params"]
    fwd = make_eval_forward(m, chop=False)
    # 16-aligned but not 32-aligned, the SID-geometry failure shape class
    x = jnp.asarray(rng.random((1, 80, 112, 4), dtype=onp.float32))
    out = fwd(p, x)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())
    # interior pixels must match the forward on an edge-padded frame
    # cropped back (the pad is 'edge', so the interior is unaffected by
    # construction only up to the receptive field — check exact equality
    # against the reference padding done by hand)
    xp = jnp.pad(x, ((0, 0), (0, 96 - 80), (0, 128 - 112), (0, 0)),
                 mode="edge")
    by_hand = m.apply({"params": p}, xp)[:, :80, :112]
    onp.testing.assert_allclose(onp.asarray(out), onp.asarray(by_hand),
                                atol=1e-6)
