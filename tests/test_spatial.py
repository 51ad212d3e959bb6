"""Spatially-sharded eval tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest

from eld_tpu.models import build_arch
from eld_tpu.parallel import make_mesh, MeshSpec
from eld_tpu.parallel.mesh import SPATIAL_AXIS
from eld_tpu.parallel.spatial import make_spatial_forward


def test_spatial_matches_local_op(rng):
    """For a local op with RF <= halo the sharded result is exact."""
    mesh = make_mesh(MeshSpec(data=2, spatial=4))
    x = jnp.asarray(rng.random((2, 128, 64, 4), dtype=onp.float32))
    kernel = jnp.ones((5, 5, 4, 4), jnp.float32) / 100.0

    def conv(t):
        return jax.lax.conv_general_dilated(
            t, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    fn = make_spatial_forward(lambda p, t: conv(t), mesh, halo=16)
    got = onp.asarray(fn(None, x))
    want = onp.asarray(conv(x))
    onp.testing.assert_allclose(got, want, atol=1e-5)


def test_spatial_unet_runs(rng):
    """Full U-Net under spatial sharding: shape + chop-protocol closeness."""
    mesh = make_mesh(MeshSpec(data=1, spatial=4))
    model = build_arch("unet", 4, 4, base_width=4)
    x = jnp.asarray(rng.random((1, 128, 64, 4), dtype=onp.float32))
    params = model.init(jax.random.PRNGKey(0), x[:, :32, :32])["params"]
    apply_fn = lambda p, t: model.apply({"params": p}, t)
    fn = make_spatial_forward(apply_fn, mesh, halo=16)
    got = onp.asarray(fn(params, x))
    want = onp.asarray(apply_fn(params, x))
    assert got.shape == want.shape
    # same acceptance criterion as the reference's chop protocol: overlap
    # tiling approximates the monolithic forward closely
    assert onp.abs(got - want).mean() < 1e-3


@pytest.mark.slow
def test_full_frame_sid_geometry(rng):
    """Eval-path proof at the REAL SID full-frame geometry (1424x2128x4,
    the packed Sony A7S2 frame): both scaling strategies — halo-sharded
    spatial eval over the mesh and the 4-tile chop — run the whole frame
    and agree with the monolithic forward (small net width; the shape,
    padding, halo, and stitch arithmetic is width-independent)."""
    from eld_tpu.ops.chop import forward_chop

    mesh = make_mesh(MeshSpec(data=2, spatial=4))
    model = build_arch("unet", 4, 4, base_width=4)
    x = jnp.asarray(rng.random((1, 1424, 2128, 4), dtype=onp.float32))
    params = model.init(jax.random.PRNGKey(0), x[:, :32, :32])["params"]
    apply_fn = lambda p, t: model.apply({"params": p}, t)

    want = onp.asarray(apply_fn(params, x))

    sharded = make_spatial_forward(apply_fn, mesh, base=model.alignment())
    got_spatial = onp.asarray(sharded(params, x))
    assert got_spatial.shape == want.shape
    assert onp.abs(got_spatial - want).mean() < 1e-3

    got_chop = onp.asarray(forward_chop(lambda t: apply_fn(params, t), x))
    assert got_chop.shape == want.shape
    assert onp.abs(got_chop - want).mean() < 1e-3


def test_spatial_pads_misaligned():
    """Heights that don't divide spatial*base are edge-padded and cropped."""
    mesh = make_mesh(MeshSpec(data=1, spatial=2))
    fn = make_spatial_forward(lambda p, t: t * 2.0, mesh)
    x = jnp.asarray(onp.random.default_rng(0).random((1, 40, 128, 4), dtype=onp.float32))
    out = fn(None, x)
    assert out.shape == x.shape
    onp.testing.assert_allclose(onp.asarray(out), onp.asarray(x) * 2.0, rtol=1e-6)


def test_engine_rejects_chop_with_spatial_mesh(tmp_path):
    """--chop with --mesh_spatial>1 is an explicit config error (spatial
    halo sharding replaces the chop), not a silent pick."""
    import pytest

    from eld_tpu.config import Config
    from eld_tpu.train.engine import Engine

    cfg = Config(name="t", checkpoints_dir=str(tmp_path / "c"),
                 is_train=False, mesh_data=1, mesh_spatial=2, chop=True,
                 no_log=True, no_verbose=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        Engine(cfg)
