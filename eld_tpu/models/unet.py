"""SID-style 5-level U-Net denoiser (the reference's only architecture).

Topology parity with ``models/arch/Unet.py:6-104``: two 3x3 convs +
LeakyReLU(0.2) per level, encoder channels 32->512 with 2x2 maxpool,
decoder with 2x2 stride-2 transposed convs and skip concatenations, 1x1
output conv, ~7.76M params at 4->4 channels.

TPU-first choices:
  * NHWC layout end-to-end (XLA's preferred conv layout on TPU);
  * optional bf16 compute dtype with f32 params (MXU-friendly);
  * optional per-level rematerialization (``jax.checkpoint``) to trade
    FLOPs for HBM when running full-frame eval;
  * initialization mirrors torch's Conv2d default (kaiming-uniform
    a=sqrt(5) => U(+-1/sqrt(fan_in)) for kernel and bias), which is what
    the reference trains with (custom init is skipped at
    ``models/ELD_model.py:393``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(-b, b), b = 1/sqrt(fan_in)
_torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _torch_uniform_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with an EXPLICIT fan-in.

    Needed where flax's shape-derived fan-in differs from torch's: torch
    computes fan_in from weight.size(1)*kh*kw, which for ConvTranspose2d
    (weight (in, out, kh, kw)) is out_channels*kh*kw — flax's (kh, kw, in,
    out) kernels would give in_channels*kh*kw."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


_torch_bias_init = _torch_uniform_init


def lrelu(x):
    """LeakyReLU(0.2) written as max(0.2x, x), like the reference."""
    return jnp.maximum(0.2 * x, x)


def max_pool_2x2(x):
    """2x2/stride-2 max pool.

    (A reshape+max variant with a cheaper gradient was benchmarked and is
    ~4% slower end-to-end on v5e — XLA fuses the reduce_window path
    better; keep nn.max_pool.)
    """
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class ConvBlock(nn.Module):
    """Two 3x3 convs with LeakyReLU(0.2)."""

    features: int
    in_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=_torch_kernel_init,
            bias_init=_torch_bias_init(self.in_features * 9),
        )(x)
        x = lrelu(x)
        x = nn.Conv(
            self.features, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=_torch_kernel_init,
            bias_init=_torch_bias_init(self.features * 9),
        )(x)
        return lrelu(x)


def space_to_depth(x, block: int = 2):
    """(N, H, W, C) -> (N, H/b, W/b, C*b*b); channel order (di, dj, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h // block, w // block, c * block * block)


def depth_to_space(x, block: int = 2):
    """(N, H, W, C*b*b) -> (N, H*b, W*b, C); channel order (di, dj, c)."""
    n, h, w, cbb = x.shape
    c = cbb // (block * block)
    x = x.reshape(n, h, w, block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * block, w * block, c)


_DN = ("NHWC", "HWIO", "NHWC")


class _SplitFirstConv(nn.Module):
    """3x3 conv over a *virtual* concat of two operands.

    conv(concat([a, b])) == conv_a(a) + conv_b(b) with the kernel sliced
    along its input-channel axis — exact up to f.p. summation order.  The
    parameter is the SAME (3, 3, ca+cb, features) kernel the concat
    version declares (checkpoint-identical tree), but the concatenated
    activation tensor is never materialized in HBM: on the decoder's
    finest level that tensor is the largest intermediate of the step.
    """

    features: int
    split: tuple  # (ca, cb) input channels of the two operands
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        ca, cb = self.split
        kernel = self.param("kernel", _torch_kernel_init,
                            (3, 3, ca + cb, self.features))
        bias = self.param("bias", _torch_bias_init((ca + cb) * 9),
                          (self.features,))
        kernel = kernel.astype(self.dtype)
        ya = jax.lax.conv_general_dilated(
            a.astype(self.dtype), kernel[:, :, :ca], (1, 1), "SAME",
            dimension_numbers=_DN)
        yb = jax.lax.conv_general_dilated(
            b.astype(self.dtype), kernel[:, :, ca:], (1, 1), "SAME",
            dimension_numbers=_DN)
        return ya + yb + bias.astype(self.dtype)


class DecBlock(nn.Module):
    """Decoder ConvBlock taking (upsampled, skip) without concatenating.

    Param tree matches ``ConvBlock`` (Conv_0/Conv_1) exactly.
    """

    features: int
    split: tuple
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, up, skip):
        x = _SplitFirstConv(self.features, self.split, dtype=self.dtype,
                            name="Conv_0")(up, skip)
        x = lrelu(x)
        x = nn.Conv(
            self.features, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=_torch_kernel_init,
            bias_init=_torch_bias_init(self.features * 9),
            name="Conv_1",
        )(x)
        return lrelu(x)


class _D2SUpsample(nn.Module):
    """2x2/stride-2 transposed conv expressed as 1x1-conv + depth-to-space.

    With kernel == stride the transposed conv has no overlapping taps:
    y[n, 2i+di, 2j+dj, o] = sum_c x[n,i,j,c] * K[di,dj,c,o] + bias[o].
    That is exactly a (C -> 4*out) pointwise contraction (one MXU matmul)
    followed by a block reshape — no lhs-dilated scatter conv, which XLA
    lowers far less efficiently on TPU.  The parameter is the same
    (2, 2, in, out) kernel ``nn.ConvTranspose`` declares.
    """

    features: int
    in_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", _torch_uniform_init(self.features * 4),
                            (2, 2, self.in_features, self.features))
        bias = self.param("bias", _torch_uniform_init(self.features * 4),
                          (self.features,))
        # lax.conv_transpose applies the kernel spatially flipped:
        # y[2i+di, 2j+dj] = sum_c x[i,j,c] K[1-di, 1-dj, c, o]
        # (2,2,in,out) -> (in, 2*2*out), channel order (di, dj, o)
        k = kernel[::-1, ::-1].astype(self.dtype).transpose(2, 0, 1, 3).reshape(
            self.in_features, 4 * self.features)
        z = jnp.einsum("nhwc,co->nhwo", x.astype(self.dtype), k)
        return depth_to_space(z, 2) + bias.astype(self.dtype)


class UNetSeeInDark(nn.Module):
    in_channels: int = 4
    out_channels: int = 4
    base_width: int = 32
    dtype: Dtype = jnp.float32   # compute dtype; params stay f32
    remat: bool = False          # checkpoint each level (full-frame eval)
    skip_mode: str = "concat"    # "split": concat-free decoder (same params)
    upsample: str = "convt"      # "d2s": 1x1-conv + depth-to-space (same params)
    # Storage dtype for the encoder skip activations (None = compute dtype).
    # jnp.bfloat16 halves the HBM bytes of the residuals that live across
    # the whole encoder->decoder span (the dominant long-lived activations
    # at 512^2) while keeping every matmul in the compute dtype — the
    # quality-conservative half of VERDICT r2 #4's bf16 idea for f32 runs.
    # NOT an exact re-parameterization: forward changes at bf16 rounding
    # scale (~3e-3 relative); params/tree unchanged (checkpoint-compatible).
    skip_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.skip_mode not in ("concat", "split"):
            raise ValueError(f"skip_mode must be 'concat' or 'split', "
                             f"got {self.skip_mode!r}")
        if self.upsample not in ("convt", "d2s"):
            raise ValueError(f"upsample must be 'convt' or 'd2s', "
                             f"got {self.upsample!r}")
        w = self.base_width
        widths = [w, 2 * w, 4 * w, 8 * w, 16 * w]  # 32..512
        in_dtype = x.dtype
        x = x.astype(self.dtype)

        block = ConvBlock
        dec_block = DecBlock
        if self.remat:
            block = nn.remat(ConvBlock)
            dec_block = nn.remat(DecBlock)

        # encoder
        skips = []
        feats = x
        in_feats = self.in_channels
        for level, width in enumerate(widths):
            feats = block(width, in_feats, dtype=self.dtype, name=f"enc{level}")(feats)
            if level < 4:
                skips.append(feats if self.skip_dtype is None
                             else feats.astype(self.skip_dtype))
                feats = max_pool_2x2(feats)
            in_feats = width

        # decoder
        for level in range(3, -1, -1):
            width = widths[level]
            if self.upsample == "d2s":
                feats = _D2SUpsample(
                    width, in_feats, dtype=self.dtype,
                    name=f"ConvTranspose_{3 - level}")(feats)
            else:
                feats = nn.ConvTranspose(
                    width, (2, 2), strides=(2, 2), dtype=self.dtype,
                    kernel_init=_torch_uniform_init(width * 4),  # torch fan_in = out*k*k
                    use_bias=True,
                    bias_init=_torch_uniform_init(width * 4),
                )(feats)
            # skips stored in skip_dtype upcast here; XLA fuses the convert
            # into the consuming conv so only the narrow copy hits HBM
            skip = skips[level].astype(self.dtype)
            if self.skip_mode == "split":
                feats = dec_block(width, (width, width), dtype=self.dtype,
                                  name=f"dec{level}")(feats, skip)
            else:
                feats = jnp.concatenate([feats, skip], axis=-1)
                feats = block(width, 2 * width, dtype=self.dtype,
                              name=f"dec{level}")(feats)
            in_feats = width

        out = nn.Conv(
            self.out_channels, (1, 1), dtype=self.dtype,
            kernel_init=_torch_kernel_init,
            bias_init=_torch_bias_init(w),
        )(feats)
        return out.astype(in_dtype)

    @staticmethod
    def alignment() -> int:
        """Spatial alignment required by the 4 pooling levels (16 px)."""
        return 16
