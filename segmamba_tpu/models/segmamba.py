"""SegMamba: tri-oriented Mamba encoder + UNETR-style CNN decoder.

Ground-up rebuild of /root/reference/model_segmamba/segmamba.py with
channels-last volumes (batch, D, H, W, C) and the TPU-native Mamba mixer.
Component map (reference file:lines):

- ``MambaLayer``    — LN over flattened tokens + MambaV3 + residual (:49-76)
- ``MlpChannel``    — 1×1×1 conv → GELU → 1×1×1 conv (:78-89)
- ``GSC``           — gated spatial conv: two 3³ conv+IN+ReLU in series,
                      summed with a parallel 1³ conv+IN+ReLU, fused by a final
                      1³ conv+IN+ReLU plus outer residual (:91-132; the fusion
                      is addition, matching the code at :127, not the paper
                      figure's multiply)
- ``MambaEncoder``  — stem conv k7 s2 p3; 3× (IN + conv k2 s2) downsamples;
                      per stage GSC → depth×MambaLayer; per-stage output head
                      IN + MlpChannel; num_slices_list = [64, 32, 16, 8]
                      (:134-193)
- ``SegMamba``      — UNETR wiring: 5 encoder blocks on input + the four
                      stage outputs, 4 up-blocks with skip concat, basic block,
                      1×1×1 output head (:195-343)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from segmamba_tpu.models.layers import Conv3d, instance_norm
from segmamba_tpu.models.mamba import MambaV3
from segmamba_tpu.models.unetr_blocks import (
    UnetOutBlock,
    UnetrBasicBlock,
    UnetrUpBlock,
)


class MambaLayer(nn.Module):
    """Flatten volume to a (B, L, C) token sequence, LayerNorm, tri-oriented
    Mamba, reshape back, residual (segmamba.py:63-76)."""

    dim: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    num_slices: int | None = None
    scan_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    mesh: object = None          # sequence-parallel mesh (see MambaV3)
    seq_axis: str = "seq"
    batch_axis: str | None = None
    model_axis: str | None = None  # tensor-parallel axis (see parallel/tp.py)

    @nn.compact
    def __call__(self, x):
        b, *spatial, c = x.shape
        assert c == self.dim
        n_tokens = 1
        for s in spatial:
            n_tokens *= s
        x_flat = x.reshape(b, n_tokens, c)
        # torch nn.LayerNorm: affine, eps 1e-5
        x_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x_flat)
        x_mamba = MambaV3(
            d_model=self.dim, d_state=self.d_state, d_conv=self.d_conv,
            expand=self.expand, nslices=self.num_slices,
            scan_impl=self.scan_impl, dtype=self.dtype, mesh=self.mesh,
            seq_axis=self.seq_axis, batch_axis=self.batch_axis,
            model_axis=self.model_axis, name="mamba")(x_norm)
        out = x_mamba.reshape(b, *spatial, c) + x
        if self.mesh is not None and self.seq_axis in self.mesh.axis_names:
            # Un-shard the token dim at the layer boundary. Leaving the
            # activation seq-sharded lets downstream stride-2 stages shrink
            # the z-dim below the seq-axis size; the resulting padded/uneven
            # shardings trip an XLA SPMD partitioner bug in the BACKWARD
            # pass ("Involuntary full rematerialization" + add_any joins):
            # measured grads 1.2-3x off on an 8-device ("data","seq") mesh
            # with stride-2 chains after an SP layer, forward exact. The
            # glue between Mamba layers is conv-local and cheap, so batch-
            # only sharding outside the layer costs little.
            from jax.sharding import NamedSharding, PartitionSpec

            axis_size = dict(zip(self.mesh.axis_names,
                                 self.mesh.devices.shape))
            baxis = (self.batch_axis if self.batch_axis is not None
                     and b % axis_size.get(self.batch_axis, 1) == 0
                     else None)
            spec = PartitionSpec(baxis, *(None,) * (out.ndim - 1))
            out = jax.lax.with_sharding_constraint(
                out, NamedSharding(self.mesh, spec))
        return out


class MlpChannel(nn.Module):
    """1×1×1 conv MLP over channels (segmamba.py:78-89)."""

    hidden_size: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv3d(self.mlp_dim, 1, 1, 0, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        return Conv3d(self.hidden_size, 1, 1, 0, dtype=self.dtype, name="fc2")(h)


class GSC(nn.Module):
    """Gated (by addition, segmamba.py:127) spatial conv block."""

    in_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.in_channels

        def conv_in_relu(h, k, pad, name):
            h = Conv3d(c, k, 1, pad, dtype=self.dtype, name=name)(h)
            return jax.nn.relu(instance_norm(h))

        x1 = conv_in_relu(x, 3, 1, "proj")
        x1 = conv_in_relu(x1, 3, 1, "proj2")
        x2 = conv_in_relu(x, 1, 0, "proj3")
        h = conv_in_relu(x1 + x2, 1, 0, "proj4")
        return h + x


class MambaEncoder(nn.Module):
    """Four-stage Mamba encoder (segmamba.py:134-193)."""

    in_chans: int = 1
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (48, 96, 192, 384)
    num_slices_list: Sequence[int] = (64, 32, 16, 8)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    scan_impl: str = "auto"
    remat: bool | str = False  # True = all blocks; "convs" = UNETR/conv only
    dtype: jnp.dtype = jnp.float32
    mesh: object = None          # sequence-parallel mesh (see MambaV3)
    seq_axis: str = "seq"
    batch_axis: str | None = None
    model_axis: str | None = None  # tensor-parallel axis (see parallel/tp.py)

    @nn.compact
    def __call__(self, x):
        outs = []
        layer_cls = MambaLayer
        # remat="convs" stores the Mamba layers' activations: their scan
        # kernels already keep memory-lean custom-VJP residuals (per-chunk
        # exit states), so wrapping them in remat only re-runs the expensive
        # scan forwards during backward — the conv blocks are where remat
        # pays (measured at the reference recipe shape, 2 x 128^3 bf16:
        # train_step 1.016 s remat=True -> 0.933 s remat="convs"; both fit
        # the 16GB chip)
        if self.remat is True:
            layer_cls = nn.remat(MambaLayer)
        for i in range(4):
            if i == 0:
                x = Conv3d(self.dims[0], 7, 2, 3, dtype=self.dtype,
                           name="stem")(x)
            else:
                x = instance_norm(x)
                x = Conv3d(self.dims[i], 2, 2, 0, dtype=self.dtype,
                           name=f"downsample{i}")(x)
            x = GSC(self.dims[i], dtype=self.dtype, name=f"gsc{i}")(x)
            for j in range(self.depths[i]):
                x = layer_cls(
                    dim=self.dims[i], num_slices=self.num_slices_list[i],
                    scan_impl=self.scan_impl, dtype=self.dtype,
                    mesh=self.mesh, seq_axis=self.seq_axis,
                    batch_axis=self.batch_axis, model_axis=self.model_axis,
                    name=f"stage{i}_block{j}")(x)
            if i in self.out_indices:
                h = instance_norm(x)
                h = MlpChannel(self.dims[i], 2 * self.dims[i],
                               dtype=self.dtype, name=f"mlp{i}")(h)
                outs.append(h)
        return tuple(outs)


class SegMamba(nn.Module):
    """Full segmentation model (segmamba.py:195-343).

    Input (batch, D, H, W, in_chans) → logits (batch, D, H, W, out_chans).
    Defaults match the BraTS config (3_train.py:41-44: 4→4 channels,
    depths [2,2,2,2], feats [48,96,192,384]).
    """

    in_chans: int = 4
    out_chans: int = 4
    depths: Sequence[int] = (2, 2, 2, 2)
    feat_size: Sequence[int] = (48, 96, 192, 384)
    hidden_size: int = 768
    num_slices_list: Sequence[int] = (64, 32, 16, 8)
    scan_impl: str = "auto"
    remat: bool | str = False  # True = all blocks; "convs" = UNETR/conv only
    dtype: jnp.dtype = jnp.float32
    mesh: object = None          # sequence-parallel mesh (see MambaV3)
    seq_axis: str = "seq"
    batch_axis: str | None = None
    model_axis: str | None = None  # tensor-parallel axis (see parallel/tp.py)

    @nn.compact
    def __call__(self, x_in):
        f = self.feat_size
        basic, up = UnetrBasicBlock, UnetrUpBlock
        if self.remat:
            # full-res decoder activations dominate training memory; remat
            # them like the encoder's mamba layers
            basic, up = nn.remat(UnetrBasicBlock), nn.remat(UnetrUpBlock)
        outs = MambaEncoder(
            in_chans=self.in_chans, depths=self.depths, dims=f,
            num_slices_list=self.num_slices_list, scan_impl=self.scan_impl,
            remat=self.remat, dtype=self.dtype, mesh=self.mesh,
            seq_axis=self.seq_axis, batch_axis=self.batch_axis,
            model_axis=self.model_axis, name="vit")(x_in)

        if self.mesh is not None and self.seq_axis in self.mesh.axis_names:
            # Pin every block boundary to batch-only sharding. Sequence
            # shardings must stay INSIDE the Mamba layers: if GSPMD
            # propagates them into the stride-2 decoder (it does, through
            # the backward graph), small spatial dims get padded/uneven
            # shardings that trip an XLA SPMD partitioner bug in the
            # gradient accumulation (see MambaLayer boundary note).
            from jax.sharding import NamedSharding, PartitionSpec

            axis_size = dict(zip(self.mesh.axis_names,
                                 self.mesh.devices.shape))
            b = x_in.shape[0]
            baxis = (self.batch_axis if self.batch_axis is not None
                     and b % axis_size.get(self.batch_axis, 1) == 0
                     else None)

            def pin(a):
                spec = PartitionSpec(baxis, *(None,) * (a.ndim - 1))
                return jax.lax.with_sharding_constraint(
                    a, NamedSharding(self.mesh, spec))
        else:
            pin = lambda a: a

        enc1 = pin(basic(f[0], dtype=self.dtype, name="encoder1")(x_in))
        enc2 = pin(basic(f[1], dtype=self.dtype, name="encoder2")(outs[0]))
        enc3 = pin(basic(f[2], dtype=self.dtype, name="encoder3")(outs[1]))
        enc4 = pin(basic(f[3], dtype=self.dtype, name="encoder4")(outs[2]))
        enc_hidden = pin(basic(self.hidden_size, dtype=self.dtype,
                               name="encoder5")(outs[3]))

        dec3 = pin(up(f[3], dtype=self.dtype, name="decoder5")(enc_hidden,
                                                               enc4))
        dec2 = pin(up(f[2], dtype=self.dtype, name="decoder4")(dec3, enc3))
        dec1 = pin(up(f[1], dtype=self.dtype, name="decoder3")(dec2, enc2))
        dec0 = pin(up(f[0], dtype=self.dtype, name="decoder2")(dec1, enc1))
        out = pin(basic(f[0], dtype=self.dtype, name="decoder1")(dec0))
        logits = UnetOutBlock(self.out_chans, dtype=self.dtype, name="out")(out)
        return pin(logits.astype(jnp.float32))
