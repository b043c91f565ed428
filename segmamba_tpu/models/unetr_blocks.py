"""UNETR-style convolutional blocks, channels-last.

Rebuilds the on-path subset of the vendored MONAI blocks:
- ``UnetResBlock`` (/root/reference/monai/networks/blocks/dynunet_block.py:25-111)
- ``UnetrBasicBlock`` (/root/reference/monai/networks/blocks/unetr_block.py:209-259)
- ``UnetrUpBlock`` (unetr_block.py:22-86)
- ``UnetOutBlock`` (dynunet_block.py:247-267)

All norms resolve to non-affine InstanceNorm (torch defaults) and the
activation is LeakyReLU(0.01), per the MONAI factories the reference uses.
Convs carry no bias except the output head (get_conv_layer bias=False default,
dynunet_block.py:279; UnetOutBlock bias=True, :260).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from segmamba_tpu.models.layers import (
    Conv3d,
    ConvTranspose3d,
    instance_norm,
    leaky_relu,
)


class UnetResBlock(nn.Module):
    """conv-IN-lrelu ×2 with (optionally projected) residual."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2
        residual = x
        h = Conv3d(self.out_channels, self.kernel_size, self.stride, pad,
                   use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = leaky_relu(instance_norm(h))
        h = Conv3d(self.out_channels, self.kernel_size, 1, pad,
                   use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = instance_norm(h)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            residual = Conv3d(self.out_channels, 1, self.stride, 0,
                              use_bias=False, dtype=self.dtype, name="conv3")(x)
            residual = instance_norm(residual)
        return leaky_relu(h + residual)


class UnetrBasicBlock(nn.Module):
    """Residual basic block (the reference always uses res_block=True,
    model_segmamba/segmamba.py:227-318)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return UnetResBlock(self.out_channels, self.kernel_size, self.stride,
                            dtype=self.dtype, name="layer")(x)


class UnetrUpBlock(nn.Module):
    """Transposed-conv ×2 upsample, concat skip, residual conv block."""

    out_channels: int
    kernel_size: int = 3
    upsample_kernel_size: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        up = ConvTranspose3d(self.out_channels, self.upsample_kernel_size,
                             self.upsample_kernel_size, use_bias=False,
                             dtype=self.dtype, name="transp_conv")(x)
        h = jnp.concatenate([up, skip], axis=-1)
        return UnetResBlock(self.out_channels, self.kernel_size, 1,
                            dtype=self.dtype, name="conv_block")(h)


class UnetOutBlock(nn.Module):
    """1×1×1 conv with bias to class logits."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv3d(self.out_channels, 1, 1, 0, use_bias=True,
                      dtype=self.dtype, name="conv")(x)
