"""Space-to-depth U-Net variant — TPU-throughput-optimized arch.

The stock SID U-Net spends most of its time in the 512^2-resolution
levels where channel counts (4->32) are far below the MXU's 128 lanes.
``unet_s2d`` rearranges each 2x2 spatial block into channels before the
network (4ch @ 512^2 -> 16ch @ 256^2) and inverts it after, so every conv
runs one pyramid level lower with 4x the channel depth — the standard
TPU/ISP trick (equivalent receptive field; the papers' pixel-shuffle
variant, cf. the commented ``pixel_shuffle`` in the reference
``models/arch/Unet.py:89``).

This is an ADDITIONAL registry arch ("unet_s2d"); "unet" stays
bit-faithful to the reference topology for checkpoint parity.
"""

from __future__ import annotations

from eld_tpu.models.unet import (UNetSeeInDark, depth_to_space,
                                 space_to_depth)


class UNetS2D(UNetSeeInDark):
    """SID U-Net operating in space-to-depth coordinates."""

    block: int = 2

    def __call__(self, x):
        s2d = space_to_depth(x, self.block)
        out = super().__call__(s2d)
        return depth_to_space(out, self.block)

    @staticmethod
    def alignment() -> int:
        return 32  # 16-px U-Net alignment in half-resolution coordinates


def unet_s2d(in_channels: int = 4, out_channels: int = 4, block: int = 2, **kw):
    b2 = block * block
    return UNetS2D(in_channels=in_channels * b2, out_channels=out_channels * b2,
                   block=block, **kw)
