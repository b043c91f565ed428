"""Common layers and torch-parity initializers.

The reference model is built from torch defaults (kaiming-uniform linear/conv
init, non-affine InstanceNorm3d, LayerNorm eps 1e-5). These helpers reproduce
those semantics in flax so that training dynamics match.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_kaiming_uniform(fan_in: int):
    """torch's default Linear/Conv weight init: kaiming_uniform(a=sqrt(5)),
    which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_uniform(fan_in: int):
    """torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    return torch_kaiming_uniform(fan_in)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Non-affine InstanceNorm over spatial dims, channels-last.

    Equivalent to ``nn.InstanceNorm3d(C)`` with torch defaults
    (affine=False, eps=1e-5, batch statistics at train and eval), which is
    what every norm in the reference model resolves to
    (monai/networks/layers/utils.py:22-50 -> nn.InstanceNorm3d).

    x: (batch, *spatial, C); statistics per (batch, channel).
    """
    axes = tuple(range(1, x.ndim - 1))
    # statistics in f32 (tiny), normalization arithmetic in the storage
    # dtype: keeps the large temporaries bf16 during training (an f32
    # upcast here doubles the dominant decoder activation memory)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(xf * xf, axis=axes, keepdims=True) - mean * mean
    scale = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return ((x - mean.astype(x.dtype)) * scale.astype(x.dtype)).astype(x.dtype)


class Conv3d(nn.Module):
    """3-D conv, channels-last, torch-default initialization.

    padding is an int (symmetric), matching torch Conv3d(padding=p).
    """

    features: int
    kernel_size: Sequence[int] | int = 3
    stride: Sequence[int] | int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        ks = (k,) * 3 if isinstance(k, int) else tuple(k)
        s = self.stride
        strides = (s,) * 3 if isinstance(s, int) else tuple(s)
        fan_in = x.shape[-1] * math.prod(ks)
        if ks == (1, 1, 1) and strides == (1, 1, 1):
            # 1x1x1 conv as an explicit matmul: XLA's TPU conv emitter runs
            # this ~4x slower than the equivalent dot (measured 10.4 ms vs
            # 2.7 ms on a 128^3 x 48ch volume). Same param names/shapes as
            # nn.Conv so checkpoints are interchangeable.
            kernel = self.param("kernel", torch_kaiming_uniform(fan_in),
                                (1, 1, 1, x.shape[-1], self.features))
            dt = self.dtype or x.dtype
            y = jnp.einsum("...c,ce->...e", x.astype(dt),
                           kernel[0, 0, 0].astype(dt))
            if self.use_bias:
                bias = self.param("bias", torch_bias_uniform(fan_in),
                                  (self.features,))
                y = y + bias.astype(dt)
            return y
        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=strides,
            padding=[(self.padding, self.padding)] * 3,
            use_bias=self.use_bias,
            kernel_init=torch_kaiming_uniform(fan_in),
            bias_init=torch_bias_uniform(fan_in),
            dtype=self.dtype,
        )(x)


class ConvTranspose3d(nn.Module):
    """Transposed 3-D conv (stride-2 upsampling in the decoder),
    channels-last, torch-default init."""

    features: int
    kernel_size: int = 2
    stride: int = 2
    use_bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        ks = (self.kernel_size,) * 3
        fan_in = x.shape[-1] * self.kernel_size ** 3
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=ks,
            strides=(self.stride,) * 3,
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=torch_kaiming_uniform(fan_in),
            bias_init=torch_bias_uniform(fan_in),
            dtype=self.dtype,
        )(x)


class TorchLinear(nn.Module):
    """Dense layer with torch Linear defaults (kaiming-uniform, optional bias)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kaiming_uniform(fan_in),
            bias_init=torch_bias_uniform(fan_in),
            dtype=self.dtype,
        )(x)


def leaky_relu(x, negative_slope=0.01):
    return jnp.where(x >= 0, x, negative_slope * x)
