"""U-Net topology tests (reference: models/arch/Unet.py)."""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest

from eld_tpu.models import build_arch, arch_names
from eld_tpu.models.unet import UNetSeeInDark, lrelu
from eld_tpu.train.state import param_count


def test_registry():
    assert "unet" in arch_names()


def test_param_count_matches_reference():
    """Reference UNetSeeInDark(4,4) has 7,760,484 parameters."""
    model = build_arch("unet", 4, 4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)))["params"]
    assert param_count(params) == 7_760_484


def test_output_shape():
    model = UNetSeeInDark(in_channels=4, out_channels=4)
    x = jnp.zeros((2, 64, 48, 4))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 64, 48, 4)


def test_channels_variants():
    for cin, cout in [(4, 4), (9, 9), (3, 3), (4, 3)]:
        model = UNetSeeInDark(in_channels=cin, out_channels=cout)
        x = jnp.zeros((1, 32, 32, cin))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        assert model.apply({"params": params}, x).shape == (1, 32, 32, cout)


def test_lrelu_matches_reference():
    """lrelu(x) = max(0.2x, x) (Unet.py:102-104)."""
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    onp.testing.assert_allclose(lrelu(x), [-0.4, -0.1, 0.0, 0.5, 2.0], rtol=1e-6)


def test_bf16_compute():
    model = UNetSeeInDark(dtype=jnp.bfloat16)
    x = jnp.ones((1, 32, 32, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    # params stay f32, output cast back to input dtype
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    y = model.apply({"params": params}, x)
    assert y.dtype == jnp.float32
    assert bool(jnp.isfinite(y).all())


def test_remat_matches():
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 4))
    m1 = UNetSeeInDark(remat=False)
    m2 = UNetSeeInDark(remat=True)
    params = m1.init(jax.random.PRNGKey(0), x)["params"]
    y1 = m1.apply({"params": params}, x)
    y2 = m2.apply({"params": params}, x)
    onp.testing.assert_allclose(onp.asarray(y1), onp.asarray(y2), atol=1e-6)


@pytest.mark.slow
def test_gradients_flow():
    model = UNetSeeInDark()
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 4))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p):
        return jnp.mean(jnp.abs(model.apply({"params": p}, x) - x))

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(onp.isfinite(norms))
    assert max(norms) > 0


def test_alignment():
    assert UNetSeeInDark.alignment() == 16


def test_netutils():
    from eld_tpu.models.netutils import receptive_field, unet_receptive_field, weight_init

    # single 3x3 conv: rf 3; two convs: 5; conv+pool+conv: 3+2*... check recurrence
    assert receptive_field([(3, 1)])[0] == 3
    assert receptive_field([(3, 1), (3, 1)])[0] == 5
    assert receptive_field([(3, 1), (2, 2), (3, 1)])[0] == 8
    assert unet_receptive_field() > 100  # 5-level UNet sees >100 px
    for kind in ("normal", "xavier", "kaiming", "orthogonal"):
        init = weight_init(kind)
        w = init(jax.random.PRNGKey(0), (3, 3, 4, 8))
        assert w.shape == (3, 3, 4, 8)


def test_multiple_loss():
    from eld_tpu.models.losses import MultipleLoss, init_loss, l1_loss, l2_loss

    pred = jnp.ones((2, 4, 4, 1))
    tgt = jnp.zeros((2, 4, 4, 1))
    assert float(init_loss("l1")(pred, tgt)) == 1.0
    assert float(init_loss("l2")(pred, tgt)) == 1.0
    combo = MultipleLoss([l1_loss, l2_loss], weight=[0.25, 0.75])
    assert float(combo(pred * 2, tgt)) == 0.25 * 2 + 0.75 * 4


def test_s2d_roundtrip(rng):
    from eld_tpu.models.unet_s2d import depth_to_space, space_to_depth

    x = jnp.asarray(rng.random((2, 16, 12, 4), dtype=onp.float32))
    y = space_to_depth(x)
    assert y.shape == (2, 8, 6, 16)
    onp.testing.assert_array_equal(onp.asarray(depth_to_space(y)), onp.asarray(x))
    # block layout: output channel c*4+k holds the k-th pixel of each 2x2
    onp.testing.assert_array_equal(onp.asarray(y[0, 0, 0, :4]),
                                   onp.asarray(x[0, 0, 0, :]))


def test_unet_s2d_arch(rng):
    from eld_tpu.models import build_arch
    from eld_tpu.train.state import param_count

    model = build_arch("unet_s2d", 4, 4, base_width=4)
    x = jnp.asarray(rng.random((1, 64, 64, 4), dtype=onp.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == (1, 64, 64, 4)
    assert bool(jnp.isfinite(y).all())
    # full-size variant has ~the same parameter budget as the stock unet
    big = build_arch("unet_s2d", 4, 4)
    p = big.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)))["params"]
    assert abs(param_count(p) - 7_760_484) / 7_760_484 < 0.01


@pytest.mark.slow
def test_unet_s2d_trains(rng):
    from eld_tpu.models import build_arch
    from eld_tpu.noise import load_camera_params
    from eld_tpu.train import create_train_state, make_train_step

    model = build_arch("unet_s2d", 4, 4, base_width=4)
    bank = load_camera_params(include=4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    step = make_train_step(model, noise_model="pg", bank=bank)
    clean = jnp.asarray(rng.random((4, 32, 32, 4), dtype=onp.float32))
    losses = []
    for i in range(15):
        state, m = step(state, {"clean": clean}, jax.random.PRNGKey(i))
        losses.append(float(m["Pixel"]))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_bandwidth_variants_exact(rng):
    """The HBM-traffic variants (concat-free decoder, depth-to-space
    upsampling — BASELINE.md roofline follow-up) are exact
    re-parameterizations: identical param trees AND matching forward +
    gradient numerics vs the stock decoder, in every combination."""
    import jax.numpy as jnp

    from eld_tpu.models.unet import UNetSeeInDark

    x = jnp.asarray(rng.random((2, 32, 32, 4), dtype=onp.float32))
    base = UNetSeeInDark(base_width=4)
    params = base.init(jax.random.PRNGKey(7), x)["params"]
    y0 = base.apply({"params": params}, x)

    def loss(p, model):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    g0 = jax.grad(loss)(params, base)

    for skip_mode in ("concat", "split"):
        for upsample in ("convt", "d2s"):
            if (skip_mode, upsample) == ("concat", "convt"):
                continue
            m = UNetSeeInDark(base_width=4, skip_mode=skip_mode,
                              upsample=upsample)
            p2 = m.init(jax.random.PRNGKey(7), x)["params"]
            # same tree, same shapes, same *values* (path-keyed RNG)
            flat0 = jax.tree_util.tree_leaves_with_path(params)
            flat2 = dict(jax.tree_util.tree_leaves_with_path(p2))
            assert set(flat2) == {k for k, _ in flat0}
            for k, v in flat0:
                onp.testing.assert_array_equal(onp.asarray(v),
                                               onp.asarray(flat2[k]), err_msg=str(k))
            y = m.apply({"params": params}, x)
            onp.testing.assert_allclose(onp.asarray(y), onp.asarray(y0),
                                        rtol=2e-5, atol=2e-5)
            g = jax.grad(loss)(params, m)
            for (k, a), (_, b) in zip(
                    jax.tree_util.tree_leaves_with_path(g0),
                    jax.tree_util.tree_leaves_with_path(g)):
                onp.testing.assert_allclose(
                    onp.asarray(a), onp.asarray(b), rtol=2e-4, atol=2e-4,
                    err_msg=str(k))


def test_bandwidth_variants_s2d_and_remat(rng):
    """Variant flags compose with unet_s2d and remat without changing
    numerics."""
    import jax.numpy as jnp

    from eld_tpu.models import build_arch

    x = jnp.asarray(rng.random((1, 64, 64, 4), dtype=onp.float32))
    base = build_arch("unet_s2d", 4, 4, base_width=4)
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    y0 = base.apply({"params": params}, x)
    opt = build_arch("unet_s2d", 4, 4, base_width=4, skip_mode="split",
                     upsample="d2s", remat=True)
    y = opt.apply({"params": params}, x)
    onp.testing.assert_allclose(onp.asarray(y), onp.asarray(y0),
                                rtol=2e-5, atol=2e-5)


def test_variant_flags_validated():
    import pytest

    from eld_tpu.models.unet import UNetSeeInDark

    x = onp.zeros((1, 16, 16, 4), onp.float32)
    with pytest.raises(ValueError, match="skip_mode"):
        UNetSeeInDark(base_width=4, skip_mode="Split").init(
            jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="upsample"):
        UNetSeeInDark(base_width=4, upsample="D2S").init(
            jax.random.PRNGKey(0), x)


def test_skip_bf16_storage(rng):
    """skip_dtype=bf16 (VERDICT r2 #4's quality-conservative half): param
    tree unchanged (checkpoint-compatible), forward within bf16 rounding
    of the f32 model, gradients finite and close in direction."""
    import jax.numpy as jnp

    from eld_tpu.models.unet import UNetSeeInDark

    x = jnp.asarray(rng.random((2, 32, 32, 4), dtype=onp.float32))
    base = UNetSeeInDark(base_width=4)
    params = base.init(jax.random.PRNGKey(7), x)["params"]
    y0 = base.apply({"params": params}, x)

    m = UNetSeeInDark(base_width=4, skip_dtype=jnp.bfloat16)
    p2 = m.init(jax.random.PRNGKey(7), x)["params"]
    flat0 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(p2))
    assert set(flat2) == {k for k, _ in flat0}
    for k, v in flat2.items():
        assert v.dtype == jnp.float32, k  # params stay f32

    y = m.apply({"params": params}, x)
    assert y.dtype == y0.dtype
    # bf16 has ~3 decimal digits; the net amplifies a little
    onp.testing.assert_allclose(onp.asarray(y), onp.asarray(y0),
                                rtol=0, atol=3e-2)
    err = float(jnp.max(jnp.abs(y - y0)))
    assert err > 0.0  # it IS a lossy storage path, not a no-op

    def loss(p, model):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    g0 = jax.grad(loss)(params, base)
    g = jax.grad(loss)(params, m)
    dots, n0, n1 = 0.0, 0.0, 0.0
    for (_, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                              jax.tree_util.tree_leaves_with_path(g)):
        a, b = onp.asarray(a, onp.float64), onp.asarray(b, onp.float64)
        assert onp.all(onp.isfinite(b))
        dots += float((a * b).sum()); n0 += float((a * a).sum()); n1 += float((b * b).sum())
    cos = dots / ((n0 ** 0.5) * (n1 ** 0.5))
    assert cos > 0.999, cos
