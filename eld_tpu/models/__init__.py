"""Model zoo + string registry (parity with the reference's arch registry,
``models/arch/__init__.py`` / ``models/ELD_model.py:391``)."""

from typing import Callable, Dict

from eld_tpu.models.unet import UNetSeeInDark

_ARCHS: Dict[str, Callable] = {}


def register_arch(name: str):
    def deco(fn):
        _ARCHS[name] = fn
        return fn
    return deco


@register_arch("unet")
def unet(in_channels: int = 4, out_channels: int = 4, **kw) -> UNetSeeInDark:
    return UNetSeeInDark(in_channels=in_channels, out_channels=out_channels, **kw)


@register_arch("unet_s2d")
def unet_s2d(in_channels: int = 4, out_channels: int = 4, **kw):
    from eld_tpu.models.unet_s2d import unet_s2d as _factory

    return _factory(in_channels, out_channels, **kw)


@register_arch("unet_s2d4")
def unet_s2d4(in_channels: int = 4, out_channels: int = 4, **kw):
    """block=4 space-to-depth variant: the speed extreme (~5.3x the stock
    topology on v5e; quality between stock and block=2 on the synthetic
    probe — see BASELINE.md)."""
    from eld_tpu.models.unet_s2d import unet_s2d as _factory

    return _factory(in_channels, out_channels, block=4, **kw)


def build_arch(name: str, in_channels: int, out_channels: int, **kw):
    if name not in _ARCHS:
        raise KeyError(f"unknown arch {name!r}; have {sorted(_ARCHS)}")
    return _ARCHS[name](in_channels, out_channels, **kw)


def arch_names():
    return sorted(_ARCHS)
