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


def _conv_k3s1_acc3(x, kern):
    """k3 s1 SAME conv as three accumulated conv2ds over shifted z-views.

    Exact (up to summation order) vs the conv3d emitter; avoids both the
    emitter's low-channel inefficiency (~26-35 Tf/s at the model's decoder
    shapes) and the conv2d depth-fold's 3x-wide xcat materialization in
    HBM. Measured 77-92 Tf/s at the hot shapes (bench_conv_acc.py)."""
    b, d, h, w, cin = x.shape
    cout = kern.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    y = None
    for kd in range(3):
        xi = xp[:, kd:kd + d].reshape(b * d, h, w, cin)
        yi = jax.lax.conv_general_dilated(
            xi, kern[kd], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = yi if y is None else y + yi
    return y.reshape(b, d, h, w, cout)


class Conv3d(nn.Module):
    """3-D conv, channels-last, torch-default initialization.

    padding is an int (symmetric), matching torch Conv3d(padding=p).
    Parameters live directly on this module ("kernel" (kz,ky,kx,Cin,Cout)
    DHWIO + "bias"), independent of which compute path the input shape
    selects — so checkpoints are layout-stable.
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
        cin = x.shape[-1]
        fan_in = cin * math.prod(ks)
        kernel = self.param("kernel", torch_kaiming_uniform(fan_in),
                            ks + (cin, self.features))
        bias = (self.param("bias", torch_bias_uniform(fan_in),
                           (self.features,))
                if self.use_bias else None)
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        kern = kernel.astype(dt)
        b, d, h, w, _ = x.shape
        if ks == (1, 1, 1) and strides == (1, 1, 1):
            # 1x1x1 conv as an explicit matmul: XLA's TPU conv emitter runs
            # this ~4x slower than the equivalent dot (measured 10.4 ms vs
            # 2.7 ms on a 128^3 x 48ch volume).
            y = jnp.einsum("...c,ce->...e", x, kern[0, 0, 0])
        elif (ks == strides and self.padding == 0
                and all(dim % k == 0 for dim, k in zip((d, h, w), ks))):
            # non-overlapping "patchify" conv (the encoder's k2s2
            # downsamples, segmamba.py stem/downsample wiring) as
            # space-to-depth + one matmul: K = prod(k)*Cin streams through
            # the MXU unpadded, vs the conv emitter's per-tap relayouts.
            kd, kh, kw = ks
            xs = x.reshape(b, d // kd, kd, h // kh, kh, w // kw, kw, cin)
            xs = jnp.transpose(xs, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
                b, d // kd, h // kh, w // kw, kd * kh * kw * cin)
            y = jnp.einsum("...c,ce->...e", xs,
                           kern.reshape(kd * kh * kw * cin, self.features))
        elif (ks[0] == ks[1] == ks[2] and ks[0] % 2 == 1
                and strides == (2, 2, 2) and self.padding == ks[0] // 2
                and d % 2 == 0 and h % 2 == 0 and w % 2 == 0):
            # (even d/h/w only: the conv2d output height at odd h is
            # floor((h-1)/2)+1 != h//2 and the reshape below would fail —
            # caught by test_conv3d_matches_torch at (6,7,8))
            # odd-k stride-2 conv (the encoder stem k7 s2 p3) as a conv2d
            # with the depth taps folded into input channels and the depth
            # stride taken by slicing: XLA's conv3d emitter runs the
            # 4-channel stem at ~3.5 Tflop/s, the folded conv2d at >100
            # (measured 10.0 ms vs <1 ms at 128^3, benchmarks/
            # bench_conv_opt.py). Matches torch Conv3d(k, stride=2,
            # padding=k//2) exactly (reference stem,
            # model_segmamba/segmamba.py MambaEncoder downsample_layers[0]).
            k0 = ks[0]
            p = k0 // 2
            dout = d // 2
            xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0), (0, 0)))
            xcat = jnp.concatenate(
                [jax.lax.slice_in_dim(xp, kd, kd + 2 * dout - 1, 2, axis=1)
                 for kd in range(k0)], axis=-1)
            wcat = jnp.transpose(kern, (1, 2, 0, 3, 4)).reshape(
                k0, k0, k0 * cin, self.features)
            y = jax.lax.conv_general_dilated(
                xcat.reshape(b * dout, h, w, k0 * cin), wcat, (2, 2),
                [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y.reshape(b, dout, h // 2, w // 2, self.features)
        elif (ks == (3, 3, 3) and strides == (1, 1, 1) and self.padding == 1
                and (d * h * w >= 64 ** 3
                     or (d * h * w >= 32 ** 3 and cin >= 96))
                and d >= 3 and cin >= 16):
            # k3s1 conv as THREE accumulated conv2ds over shifted z-views
            # (depth taps in the loop, not the channel dim): XLA's TPU
            # conv3d emitter runs the model's low-channel full-resolution
            # convs at ~26-35 Tflop/s; the earlier conv2d depth-fold (K =
            # 3*Cin) reached ~51-75 but materializes a 3x-wide xcat in HBM;
            # accumulating three plain conv2ds keeps the input un-copied
            # and measured 77-156 Tf/s at the decoder shapes (1.3-3.1x over
            # the previous dispatch, benchmarks/bench_conv_acc.py). Tiny
            # cin (the 4-channel enc1 input) stays on the depth-fold form
            # below — 3 conv2ds at K=4 measured slower (0.49 vs 0.31 ms).
            y = _conv_k3s1_acc3(x, kern)
        elif (ks == (3, 3, 3) and strides == (1, 1, 1) and self.padding == 1
                and d * h * w >= 128 ** 3 and d >= 3):
            # low-cin full-res conv (enc1's 4->48 at 128^3): conv2d with
            # the depth taps folded into input channels (K = 3*cin) — the
            # plain conv3d emitter runs this at ~7 Tf/s, the fold at ~70.
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            xcat = jnp.concatenate([xp[:, kd:kd + d] for kd in range(3)],
                                   axis=-1)
            wcat = jnp.transpose(kern, (1, 2, 0, 3, 4)).reshape(
                3, 3, 3 * cin, self.features)
            y = jax.lax.conv_general_dilated(
                xcat.reshape(b * d, h, w, 3 * cin), wcat, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y.reshape(b, d, h, w, self.features)
        else:
            y = jax.lax.conv_general_dilated(
                x, kern, strides, [(self.padding, self.padding)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if bias is not None:
            y = y + bias.astype(dt)
        return y


class ConvTranspose3d(nn.Module):
    """Transposed 3-D conv (stride-2 upsampling in the decoder),
    channels-last, torch-default init. Param layout matches flax
    nn.ConvTranspose ("kernel" (kz,ky,kx,Cin,Cout)) but lives directly on
    this module."""

    features: int
    kernel_size: int = 2
    stride: int = 2
    use_bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        ks = (self.kernel_size,) * 3
        fan_in = x.shape[-1] * self.kernel_size ** 3
        kernel = self.param("kernel", torch_kaiming_uniform(fan_in),
                            ks + (x.shape[-1], self.features))
        dt = self.dtype or x.dtype
        if self.kernel_size == self.stride:
            # k == s transposed conv (every decoder upsample) as one matmul
            # + depth-to-space: each output voxel has exactly one
            # contributing tap, y[s*i + r] = x[i] @ w[k-1-r] (conv_transpose
            # evaluates the kernel flipped), so the conv collapses to
            # x @ W (C -> k^3*Cout) and a reshape. N = k^3*Cout fills the
            # MXU columns the conv emitter leaves 62% idle at Cout=48
            # (measured 3.2x, benchmarks/bench_conv_opt.py).
            k = self.kernel_size
            xb = x.astype(dt)
            b, d, h, w, cin = xb.shape
            wm = jnp.flip(kernel.astype(dt), axis=(0, 1, 2))
            wm = jnp.transpose(wm, (3, 0, 1, 2, 4)).reshape(
                cin, k ** 3 * self.features)
            y = jnp.einsum("...c,ce->...e", xb, wm)
            y = y.reshape(b, d, h, w, k, k, k, self.features)
            y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(
                b, k * d, k * h, k * w, self.features)
        else:
            y = jax.lax.conv_transpose(
                x.astype(dt), kernel.astype(dt), (self.stride,) * 3, "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            bias = self.param("bias", torch_bias_uniform(fan_in),
                              (self.features,))
            y = y + bias.astype(dt)
        return y


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
