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
