"""Training smoke + multi-device parity tests."""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest

from eld_tpu.models import build_arch
from eld_tpu.noise import load_camera_params
from eld_tpu.parallel import make_mesh, MeshSpec
from eld_tpu.parallel.mesh import shard_batch
from eld_tpu.train import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_forward,
    set_learning_rate,
)
from eld_tpu.train.state import get_learning_rate


@pytest.fixture(scope="module")
def small_model():
    return build_arch("unet", 4, 4, base_width=4)


@pytest.fixture(scope="module")
def bank():
    return load_camera_params(include=4)


@pytest.mark.slow
def test_synthetic_training_reduces_loss(small_model, bank, rng):
    state = create_train_state(small_model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    step = make_train_step(small_model, noise_model="pg", bank=bank)
    clean = jnp.asarray(rng.random((4, 32, 32, 4), dtype=onp.float32))
    losses = []
    for i in range(30):
        state, m = step(state, {"clean": clean}, jax.random.PRNGKey(i))
        losses.append(float(m["Pixel"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 30


def test_paired_training_mode(small_model, rng):
    state = create_train_state(small_model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    step = make_train_step(small_model, loss="l2")
    batch = {
        "input": jnp.asarray(rng.random((2, 32, 32, 4), dtype=onp.float32)),
        "target": jnp.asarray(rng.random((2, 32, 32, 4), dtype=onp.float32)),
    }
    l0 = None
    for i in range(10):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        l0 = l0 or float(m["Pixel"])
    assert float(m["Pixel"]) < l0


def test_lr_schedule_injection(small_model):
    state = create_train_state(small_model, jax.random.PRNGKey(0), (1, 32, 32, 4), lr=1e-4)
    assert get_learning_rate(state) == pytest.approx(1e-4)
    state = set_learning_rate(state, 5e-5)
    assert get_learning_rate(state) == pytest.approx(5e-5)


@pytest.mark.slow
def test_mesh_dp_matches_single_device(small_model, bank, rng):
    """8-way data parallel step == single-device step on the same batch."""
    clean = rng.random((8, 32, 32, 4), dtype=onp.float32)
    key = jax.random.PRNGKey(42)

    state1 = create_train_state(small_model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    step1 = make_train_step(small_model, noise_model="pg", bank=bank, donate=False)
    s1, m1 = step1(state1, {"clean": jnp.asarray(clean)}, key)

    mesh = make_mesh(MeshSpec(data=8))
    state8 = create_train_state(small_model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    step8 = make_train_step(small_model, noise_model="pg", bank=bank, mesh=mesh, donate=False)
    batch = shard_batch(mesh, {"clean": clean})
    s8, m8 = step8(state8, batch, key)

    assert float(m1["Pixel"]) == pytest.approx(float(m8["Pixel"]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s8.params)):
        onp.testing.assert_allclose(onp.asarray(a), onp.asarray(b), atol=1e-5)


def test_eval_forward_with_chop(small_model, rng):
    state = create_train_state(small_model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    fwd = make_eval_forward(small_model, chop=True)
    x = jnp.asarray(rng.random((1, 96, 96, 4), dtype=onp.float32))
    out = fwd(state.params, x)
    assert out.shape == (1, 96, 96, 4)


@pytest.mark.slow
def test_u16_device_normalize_matches_f32(bank, tmp_path, rng):
    """uint16-transfer batches train equivalently to host-normalized f32
    batches: same input values (same reciprocal constant), identical loss;
    gradients may differ in the last ulp from XLA fusing the in-graph
    conversion differently."""
    from eld_tpu.data.datasets import CleanPatchDataset
    from eld_tpu.data.loader import Loader
    from eld_tpu.data.patchstore import PatchStore, PatchStoreWriter

    path = str(tmp_path / "s.eps")
    with PatchStoreWriter(path, (32, 32, 4), dtype=onp.uint16) as w:
        for _ in range(4):
            w.append(rng.integers(0, 65536, (32, 32, 4)).astype(onp.uint16))
    store = PatchStore(path)

    model = build_arch("unet", 4, 4, base_width=4)
    key = jax.random.PRNGKey(3)
    outs = []
    for device_normalize in (False, True):
        ds = CleanPatchDataset(store, augment=False, device_normalize=device_normalize)
        batch = next(iter(Loader(ds, batch_size=4, num_workers=0)))
        assert batch["clean"].dtype == (onp.uint16 if device_normalize else onp.float32)
        state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 4))
        step = make_train_step(model, noise_model="pg", bank=bank, donate=False)
        s, m = step(state, {"clean": jnp.asarray(batch["clean"])}, key)
        outs.append((float(m["Pixel"]), s.params))
    assert outs[0][0] == outs[1][0]
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                    jax.tree_util.tree_leaves(outs[1][1])):
        onp.testing.assert_allclose(onp.asarray(a), onp.asarray(b), atol=1e-6)


def test_multihost_helpers_single_process(monkeypatch, rng):
    """Single-process: host_shard is (0, 1) and initialize_multihost is a
    safe no-op.  The multi-process shard_batch branch (assembling global
    arrays from process-local rows via make_array_from_process_local_data)
    is exercised by forcing the branch — with one real process the local
    rows ARE the global batch, so it must produce arrays identical to the
    plain device_put path."""
    import jax

    from eld_tpu.parallel import make_mesh, MeshSpec
    from eld_tpu.parallel import mesh as mesh_mod
    from eld_tpu.parallel.multihost import host_shard, initialize_multihost

    assert host_shard() == (0, 1)
    assert initialize_multihost() == (0, 1)

    mesh = make_mesh(MeshSpec(data=4, spatial=1), jax.devices()[:4])
    batch = {"clean": rng.random((8, 16, 16, 4)).astype(onp.float32)}
    plain = shard_batch(mesh, batch)

    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    forced = mesh_mod.shard_batch(mesh, batch)
    assert forced["clean"].sharding == plain["clean"].sharding
    onp.testing.assert_array_equal(onp.asarray(forced["clean"]),
                                   onp.asarray(plain["clean"]))


def test_device_scene_generator_matches_host_distribution(rng):
    """demo_synthetic's on-device scene generator (used for clean sets too
    big for this rig's host->device link) must produce the same scene
    family as the host generator: same clipping range and first/second
    moments within tolerance, correct shape with non-multiple-of-chunk n."""
    import jax

    from eld_tpu.tools.demo_synthetic import make_scenes, make_scenes_device

    dev = onp.asarray(make_scenes_device(jax.random.PRNGKey(0), 40, 96, chunk=16))
    host = make_scenes(onp.random.default_rng(0), 40, 96)
    assert dev.shape == host.shape == (40, 96, 96, 4)
    assert dev.min() >= 0.02 and dev.max() <= 0.98
    assert abs(dev.mean() - host.mean()) < 0.1
    assert abs(dev.std() - host.std()) < 0.08
    # distinct scenes (keys actually vary across chunks)
    assert onp.std(dev.mean(axis=(1, 2, 3))) > 0.01


def test_demo_synthetic_arg_guards():
    """The scan/lr_decay/sample flag combinations that would silently
    change the A/B semantics are refused with an explanatory exit:
    mis-aligned LR boundaries under --scan (the schedule would shift to a
    launch boundary), perm sampling under --scan (the pool semantics IS
    the thing being A/B'd), and perm with batch not dividing n_train."""
    from eld_tpu.tools.demo_synthetic import main

    with pytest.raises(SystemExit):
        main(["--scan", "3", "--steps", "10", "--lr_decay"])  # 5 % 3 != 0
    with pytest.raises(SystemExit):
        main(["--scan", "2", "--steps", "20", "--sample", "perm"])
    with pytest.raises(SystemExit):
        main(["--steps", "4", "--sample", "perm",
              "--batch", "3", "--n_train", "8"])


def test_multihost_payload_helpers(rng):
    """allgather_objects is identity single-process; oversize payloads
    encode a sentinel that decodes to a ValueError on EVERY process
    (raising host-locally before the collective would hang the pod)."""
    from eld_tpu.parallel.multihost import (_decode, _encode,
                                            allgather_objects,
                                            broadcast_from_host0)

    obj = {"PSNR": [12.5, 3], "SSIM": [0.9, 3]}
    assert allgather_objects(obj) == [obj]
    assert broadcast_from_host0(obj) == obj

    buf = _encode(obj, 1 << 16)
    assert _decode(buf, 1 << 16) == obj

    big = {"x": "y" * 200}
    buf = _encode(big, 64)  # must NOT raise on the encoding host
    with pytest.raises(ValueError, match="every process"):
        _decode(buf, 64)


def test_all_hosts_agree_single_process():
    from eld_tpu.parallel.multihost import all_hosts_agree

    assert all_hosts_agree(True)
    assert not all_hosts_agree(False)
    assert all_hosts_agree({"nonempty": 1})  # truthiness semantics


# ---------------------------------------------------------------------------
# make_train_scan: K fused steps per dispatch over a device-resident pool
# ---------------------------------------------------------------------------


def test_train_scan_reduces_loss_and_counts_steps(small_model, bank, rng):
    from eld_tpu.train.steps import make_train_scan

    state = create_train_state(small_model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    fn = make_train_scan(small_model, noise_model="pg", bank=bank,
                         batch=4, steps_per_call=5, donate=False)
    pool = {"clean": jnp.asarray(rng.random((12, 32, 32, 4), dtype=onp.float32))}
    state, m0 = fn(state, pool, jax.random.PRNGKey(1))
    for i in range(2, 8):
        state, m = fn(state, pool, jax.random.PRNGKey(i))
    assert int(state.step) == 35
    assert float(m["Pixel"]) < float(m0["Pixel"])
    assert onp.isfinite(float(m["PixelLast"]))


@pytest.mark.slow
def test_train_scan_deterministic(small_model, bank, rng):
    from eld_tpu.train.steps import make_train_scan

    pool = {"clean": jnp.asarray(rng.random((6, 32, 32, 4), dtype=onp.float32))}
    fn = make_train_scan(small_model, noise_model="pg", bank=bank,
                         batch=2, steps_per_call=3, donate=False)
    outs = []
    for _ in range(2):
        state = create_train_state(small_model, jax.random.PRNGKey(0), (1, 32, 32, 4))
        state, m = fn(state, pool, jax.random.PRNGKey(7))
        outs.append((state, float(m["Pixel"])))
    assert outs[0][1] == outs[1][1]
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][0].params),
                    jax.tree_util.tree_leaves(outs[1][0].params)):
        onp.testing.assert_array_equal(onp.asarray(a), onp.asarray(b))


def test_train_scan_paired_mode(small_model, rng):
    from eld_tpu.train.steps import make_train_scan

    clean = rng.random((8, 32, 32, 4), dtype=onp.float32)
    pool = {
        "input": jnp.asarray(onp.clip(clean + 0.1 * rng.standard_normal(clean.shape), 0, 1),
                             jnp.float32),
        "target": jnp.asarray(clean),
    }
    state = create_train_state(small_model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    fn = make_train_scan(small_model, loss="l2", batch=4, steps_per_call=4,
                         donate=False)
    state, m0 = fn(state, pool, jax.random.PRNGKey(1))
    for i in range(2, 6):
        state, m = fn(state, pool, jax.random.PRNGKey(i))
    assert float(m["Pixel"]) < float(m0["Pixel"])


@pytest.mark.slow
def test_train_scan_u16_pool_matches_f32(small_model, bank, rng):
    """uint16 pools (half the HBM) must train bit-identically to the f32
    pool holding the same normalized values (same reciprocal constant)."""
    from eld_tpu.train.steps import make_train_scan

    u16 = rng.integers(0, 65536, (6, 32, 32, 4)).astype(onp.uint16)
    f32 = u16.astype(onp.float32) / 65535.0
    fn = make_train_scan(small_model, noise_model="pg", bank=bank,
                         batch=2, steps_per_call=3, donate=False)
    results = []
    for pool in ({"clean": jnp.asarray(u16)}, {"clean": jnp.asarray(f32)}):
        state = create_train_state(small_model, jax.random.PRNGKey(0), (1, 32, 32, 4))
        state, m = fn(state, pool, jax.random.PRNGKey(3))
        results.append(state)
    for a, b in zip(jax.tree_util.tree_leaves(results[0].params),
                    jax.tree_util.tree_leaves(results[1].params)):
        onp.testing.assert_allclose(onp.asarray(a), onp.asarray(b), atol=1e-7)


@pytest.mark.slow
def test_train_scan_mesh_matches_single_device(small_model, bank, rng):
    """The scanned trainer under an 8-way data mesh == single-device."""
    from eld_tpu.train.steps import make_train_scan

    pool_np = rng.random((16, 32, 32, 4), dtype=onp.float32)
    key = jax.random.PRNGKey(11)

    state1 = create_train_state(small_model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    fn1 = make_train_scan(small_model, noise_model="pg", bank=bank,
                          batch=8, steps_per_call=3, donate=False)
    s1, m1 = fn1(state1, {"clean": jnp.asarray(pool_np)}, key)

    mesh = make_mesh(MeshSpec(data=8))
    state8 = create_train_state(small_model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    fn8 = make_train_scan(small_model, noise_model="pg", bank=bank,
                          batch=8, steps_per_call=3, mesh=mesh)
    s8, m8 = fn8(state8, {"clean": jnp.asarray(pool_np)}, key)

    assert float(m1["Pixel"]) == pytest.approx(float(m8["Pixel"]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        onp.testing.assert_allclose(onp.asarray(a), onp.asarray(b), atol=1e-5)


def test_augment_batch_covers_dihedral_orbit(rng):
    """Every augmented row is one of the 8 flip/transpose images of its
    source row, all arrays transformed jointly, and over many draws more
    than one variant occurs (it actually randomizes)."""
    from eld_tpu.train.steps import _augment_batch

    x = jnp.asarray(rng.random((16, 8, 8, 2), dtype=onp.float32))
    y = x[:, :, :, :1] * 2.0
    xa, ya = _augment_batch(jax.random.PRNGKey(0), x, y)
    xa, ya, xn = onp.asarray(xa), onp.asarray(ya), onp.asarray(x)

    def orbit(img):
        outs = []
        for f0 in (False, True):
            for f1 in (False, True):
                for t in (False, True):
                    v = img
                    if f0:
                        v = v[::-1]
                    if f1:
                        v = v[:, ::-1]
                    if t:
                        v = v.transpose(1, 0, 2)
                    outs.append(v)
        return outs

    seen = set()
    for i in range(16):
        matches = [k for k, v in enumerate(orbit(xn[i])) if onp.array_equal(xa[i], v)]
        assert matches, f"row {i} is not a dihedral image of its source"
        # the paired array got the SAME transform
        assert any(onp.array_equal(ya[i], v)
                   for v in orbit(onp.asarray(y)[i]))
        seen.update(matches)
    assert len(seen) > 1


def test_auto_noise_gate_is_batch_aware(monkeypatch):
    """noise_impl="auto" picks the Pallas kernel only at large PER-DEVICE
    batch on TPU (round-5 crossover map, BASELINE.md): jnp at batch < 32,
    pallas from 32 up; mesh data-sharding divides the global batch first;
    misaligned rows and non-TPU backends always fall back to jnp."""
    from eld_tpu.train import steps as steps_mod
    from eld_tpu.train.steps import _auto_pallas_noise, PALLAS_NOISE_MIN_BATCH

    # build the mesh BEFORE patching: steps_mod.jax is the global module,
    # so patching .devices would otherwise starve make_mesh of devices
    mesh = make_mesh(MeshSpec(data=8))

    class _Dev:
        platform = "tpu"

    monkeypatch.setattr(steps_mod.jax, "devices", lambda: [_Dev()])

    aligned = (512, 512, 4)  # W*C=2048 lane-aligned, H%8==0
    assert not _auto_pallas_noise((16,) + aligned)
    assert _auto_pallas_noise((PALLAS_NOISE_MIN_BATCH,) + aligned)
    assert _auto_pallas_noise((128,) + aligned)
    # per-device batch under an 8-way data mesh: 128 global -> 16 local
    assert not _auto_pallas_noise((128,) + aligned, mesh)
    assert _auto_pallas_noise((256,) + aligned, mesh)
    # alignment guards (W*C % 128, H % 8) still veto
    assert not _auto_pallas_noise((128, 512, 37, 4))
    assert not _auto_pallas_noise((128, 511, 512, 4))
    # non-TPU backend always falls back to jnp
    _Dev.platform = "cpu"
    assert not _auto_pallas_noise((128,) + aligned)
