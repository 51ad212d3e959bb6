"""Real-data import path kept warm (VERDICT r3 #8).

No SID/ELD raws or released .pt checkpoints are reachable in this
environment (zero egress), so the paper-table reproduction plan cannot
run yet.  These tests pin the entry points it needs against bit-rot:
the eval CLIs' argparse surfaces stay loadable (--help exits 0) and
``compat/torch_import`` keeps loading the reference's on-disk checkpoint
format against the image's current torch pin."""

import importlib

import pytest


@pytest.mark.parametrize("tool", ["test_sid", "test_eld", "denoise",
                                  "export_model", "convert_raw"])
def test_cli_help_exits_zero(tool, capsys):
    mod = importlib.import_module(f"eld_tpu.tools.{tool}")
    with pytest.raises(SystemExit) as e:
        mod.main(["--help"])
    assert e.value.code == 0
    assert "usage" in capsys.readouterr().out.lower()


def test_torch_import_loads_reference_pt_format(tmp_path):
    """The reference saves {netG, opt_g, epoch, iterations} via torch.save
    (models/ELD_model.py:516-523); import_torch_checkpoint must keep
    parsing that layout under the current torch pin (weights_only
    semantics changed across torch majors — this is the canary)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    import numpy as onp

    from eld_tpu.compat.torch_import import (export_torch_state_dict,
                                             load_torch_checkpoint)
    from eld_tpu.models import build_arch

    model = build_arch("unet", 4, 4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)))["params"]
    sd = {k: torch.from_numpy(onp.asarray(v))
          for k, v in export_torch_state_dict(params).items()}
    pt = str(tmp_path / "model_200_00000000.pt")
    torch.save({"netG": sd, "opt_g": {}, "epoch": 200, "iterations": 9}, pt)

    got, epoch, iters = load_torch_checkpoint(pt, params)
    assert epoch == 200 and iters == 9
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got)):
        onp.testing.assert_array_equal(onp.asarray(a), onp.asarray(b))
