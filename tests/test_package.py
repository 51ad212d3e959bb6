"""Package surface: version sync with the packaging metadata and the
lazy top-level conveniences."""

import os
import tomllib

import eld_tpu


def test_version_matches_pyproject():
    pyproject = os.path.join(os.path.dirname(__file__), "..",
                             "pyproject.toml")
    with open(pyproject, "rb") as f:
        meta = tomllib.load(f)
    assert eld_tpu.__version__ == meta["project"]["version"]


def test_lazy_top_level_api():
    for name in ("Engine", "Config", "build_arch", "save_denoiser",
                 "load_denoiser", "quantize_params", "dequantize_params"):
        assert callable(getattr(eld_tpu, name)), name
    try:
        eld_tpu.not_a_thing
        raise AssertionError("expected AttributeError")
    except AttributeError:
        pass
