"""PNG codec tests — both the PIL path and the self-contained fallback."""

import numpy as onp
import pytest

from eld_tpu.utils import images


def test_png_roundtrip_rgb(tmp_path, rng):
    img = (rng.random((20, 30, 3)) * 255).astype(onp.uint8)
    p = str(tmp_path / "a.png")
    images.save_png(p, img)
    back = images.load_png(p)
    onp.testing.assert_array_equal(back, img)


def test_png_packed_raw_preview(tmp_path, rng):
    img = (rng.random((16, 16, 4)) * 255).astype(onp.uint8)
    p = str(tmp_path / "raw.png")
    images.save_png(p, img)  # RGBG -> binned RGB preview
    back = images.load_png(p)
    assert back.shape == (16, 16, 3)
    onp.testing.assert_array_equal(back[..., 0], img[..., 0])


def test_png_fallback_codec(tmp_path, rng, monkeypatch):
    """The self-contained writer/reader (used when PIL is absent)."""
    monkeypatch.setattr(images, "_PILImage", None)
    img = (rng.random((12, 18, 3)) * 255).astype(onp.uint8)
    p = str(tmp_path / "fb.png")
    images.save_png(p, img)
    back = images.load_png(p)
    onp.testing.assert_array_equal(back, img)
    # and PIL can read what the fallback wrote (format validity)
    from PIL import Image

    onp.testing.assert_array_equal(onp.asarray(Image.open(p)), img)
