"""Fused Mamba inner op: causal conv1d + projections + selective scan + gate.

TPU-native equivalent of ``mamba_inner_fn_no_out_proj`` — the op SegMamba
actually runs per direction
(/root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:155-289,
entry :627-633). The reference fuses everything into one autograd node with
manual recompute (checkpoint_lvl=1, :218-241); here only the scan core is a
custom Pallas op — the conv and the small projections are plain jnp, which XLA
fuses and differentiates. Use ``jax.checkpoint`` around this function for the
reference's recompute-in-backward memory behavior.

Weight conventions are JAX-style ``(in, out)`` matmul matrices; the reference's
torch ``Linear.weight`` is the transpose.
"""

from __future__ import annotations

import jax.numpy as jnp

from segmamba_tpu.ops.causal_conv1d import causal_conv1d
from segmamba_tpu.ops.selective_scan import selective_scan


def mamba_inner(xz, conv_weight, conv_bias, x_proj, dt_proj, dt_bias,
                A, D_skip, *, d_state, impl="auto", chunk_size=128):
    """One Mamba direction on a pre-projected sequence.

    Args:
      xz:          (batch, seqlen, 2*d_inner) — in_proj output, [x | z] halves.
      conv_weight: (width, d_inner) depthwise causal filter.
      conv_bias:   (d_inner,) or None.
      x_proj:      (d_inner, dt_rank + 2*d_state) — combined dt/B/C projection
                   (reference x_proj_weight, selective_scan_interface.py:181).
      dt_proj:     (dt_rank, d_inner); dt_bias: (d_inner,) float32.
      A:           (d_inner, d_state) negative real state matrix.
      D_skip:      (d_inner,) skip weights.
    Returns:
      (batch, seqlen, d_inner) — scan output gated by silu(z), pre-out_proj.
    """
    d_inner = xz.shape[-1] // 2
    x, z = xz[..., :d_inner], xz[..., d_inner:]
    dt_rank = x_proj.shape[1] - 2 * d_state

    # conv + silu (reference :177)
    x = causal_conv1d(x, conv_weight, conv_bias, activation="silu")
    # x_proj matmul producing [dt | B | C] (reference :181-182,188,200)
    x_dbl = jnp.einsum("bld,de->ble", x, x_proj.astype(x.dtype))
    dt = jnp.einsum("blr,rd->bld", x_dbl[..., :dt_rank], dt_proj.astype(x.dtype))
    B = x_dbl[..., dt_rank:dt_rank + d_state]
    C = x_dbl[..., dt_rank + d_state:]

    use_fused = impl in ("auto", "pallas", "fused") and (
        impl == "fused" or __import__("jax").default_backend() == "tpu")
    if use_fused and dt_bias is not None and D_skip is not None:
        # single-pass kernel: softplus + scan + D-skip + silu(z) gate fused,
        # storage-dtype I/O (see scan_pallas_fused.py)
        from segmamba_tpu.ops.scan_pallas_fused import mamba_scan_fused
        return mamba_scan_fused(x, dt, z, A, B, C, D_skip, dt_bias,
                                chunk_size=chunk_size)

    return selective_scan(
        x, dt, A, B, C, D=D_skip, z=z, delta_bias=dt_bias,
        delta_softplus=True, impl=impl, chunk_size=chunk_size,
    )
