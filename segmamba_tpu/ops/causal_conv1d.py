"""Depthwise causal 1-D convolution, time-major.

Replaces the reference CUDA extension ``causal_conv1d_cuda``
(/root/reference/causal-conv1d/csrc/causal_conv1d.cpp:329-332 and the python
wrapper /root/reference/causal-conv1d/causal_conv1d/causal_conv1d_interface.py:37-80).

On TPU a width-2..4 depthwise causal conv is a handful of shifted
multiply-adds; XLA fuses them into neighbouring elementwise work and
differentiates them, so no hand-written kernel (or custom VJP) is needed.
Layout is time-major ``(batch, seqlen, dim)``; the kernel weight is
``(width, dim)`` (the reference stores ``(dim, 1, width)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_conv1d(x, weight, bias=None, activation=None):
    """y[t, d] = act( sum_w weight[w, d] * x[t - (W-1) + w, d] + bias[d] ).

    Args:
      x:      (batch, seqlen, dim).
      weight: (width, dim) depthwise filter, width in [1, 4] like the
              reference (causal_conv1d.cpp:157 restricts to 2..4).
      bias:   (dim,) or None.
      activation: None or "silu" (reference accepts only these,
              causal_conv1d_interface.py:45).
    Returns:
      (batch, seqlen, dim), same dtype as x.
    """
    if activation not in (None, "silu", "swish"):
        raise ValueError(f"unsupported activation {activation!r}")
    width, dim = weight.shape
    if x.shape[-1] != dim:
        raise ValueError(f"channel mismatch: x {x.shape} vs weight {weight.shape}")
    seqlen = x.shape[1]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    w = weight.astype(jnp.float32)
    xp = jnp.pad(xf, ((0, 0), (width - 1, 0), (0, 0)))
    y = jnp.zeros_like(xf)
    for i in range(width):
        # xp[:, i : i + L][t] == x[t + i - (W-1)]
        y = y + w[i] * jax.lax.dynamic_slice_in_dim(xp, i, seqlen, axis=1)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if activation in ("silu", "swish"):
        y = jax.nn.silu(y)
    return y.astype(dtype)


def causal_conv1d_grouped(x, weight, bias, batch, activation=None):
    """Depthwise causal conv with per-group filters.

    x: (groups*batch, seqlen, dim); weight: (groups, width, dim);
    bias: (groups, dim) or None. Row i of x uses filter i // batch — used to
    fold e.g. the three scan orientations into one batched op.
    """
    if activation not in (None, "silu", "swish"):
        raise ValueError(f"unsupported activation {activation!r}")
    groups, width, dim = weight.shape
    assert x.shape[0] == groups * batch
    seqlen = x.shape[1]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    w = jnp.repeat(weight.astype(jnp.float32), batch, axis=0)  # (g·b, W, D)
    xp = jnp.pad(xf, ((0, 0), (width - 1, 0), (0, 0)))
    y = jnp.zeros_like(xf)
    for i in range(width):
        y = y + w[:, i][:, None, :] * jax.lax.dynamic_slice_in_dim(
            xp, i, seqlen, axis=1)
    if bias is not None:
        y = y + jnp.repeat(bias.astype(jnp.float32), batch, axis=0)[:, None, :]
    if activation in ("silu", "swish"):
        y = jax.nn.silu(y)
    return y.astype(dtype)


def causal_conv1d_directional(x, weight, bias, activation=None,
                              nslices=None):
    """Depthwise causal conv for all scan orientations WITHOUT materializing
    reordered input copies.

    The tri-oriented Mamba (mamba_simple.py:215-264) runs its conv on three
    views of the same sequence: identity, time-flipped, slice-interleaved.
    Reordering a 262k-token activation in HBM costs more than the conv
    itself; instead each orientation's conv is expressed directly on the
    original layout:

    - group 0 (forward):  y[t] = act(sum_i w[i] x[t-(W-1)+i] + b)
    - group 1 (flip):     flip(conv(flip(x))) == anticausal conv,
                          y[t] = act(sum_i w[i] x[t+(W-1)-i] + b)
    - group 2 (slice):    conv in slice-interleaved order. With x viewed as
                          (S, P) slices x positions (t = s*P + p), the
                          interleaved predecessor q-1 of q=(p*S+s) is
                          (s-1, p), wrapping to (S-1, p-1) at slice 0 — a
                          shift along the slice axis with a one-position
                          carry, built from two slices + a pad (contiguous
                          copies, no transpose). Output stays in original
                          (slice-major) layout.

    Args:
      x: (batch, L, dim) original layout.
      weight: (G, width, dim) per-group filters, G in {2, 3} — groups are
              ordered [forward, flip, slice].
      bias: (G, dim) or None.
      nslices: S for the slice group (required when G == 3).
    Returns:
      (G, batch, L, dim) conv output per orientation, x.dtype, original
      token order for every group.
    """
    if activation not in (None, "silu", "swish"):
        raise ValueError(f"unsupported activation {activation!r}")
    G, width, dim = weight.shape
    batch, seqlen, _ = x.shape
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    w = weight.astype(jnp.float32)

    def shifted(i, direction):
        """x[t + direction*(i - (W-1))] with zero fill (time axis)."""
        off = i - (width - 1)
        if direction < 0:
            off = -off
        if off == 0:
            return xf
        if off < 0:
            pad = jnp.zeros((batch, -off, dim), jnp.float32)
            return jnp.concatenate([pad, xf[:, :seqlen + off]], axis=1)
        pad = jnp.zeros((batch, off, dim), jnp.float32)
        return jnp.concatenate([xf[:, off:], pad], axis=1)

    outs = []
    for g, direction in ((0, +1), (1, -1)):
        y = jnp.zeros_like(xf)
        for i in range(width):
            y = y + w[g, i] * shifted(i, direction)
        outs.append(y)

    if G == 3:
        if nslices is None or seqlen % nslices != 0:
            raise ValueError("slice group needs nslices dividing L")
        S, P = nslices, seqlen // nslices
        xg = xf.reshape(batch, S, P, dim)

        def slice_shifted(k):
            """token (q - k) of the interleaved order, original layout."""
            if k == 0:
                return xf
            # rows s >= k: (s-k, p); rows s < k: (S-k+s, p-1), zero at p=0
            upper = xg[:, :S - k, :, :]
            wrap = jnp.concatenate(
                [jnp.zeros((batch, k, 1, dim), jnp.float32),
                 xg[:, S - k:, :P - 1, :]], axis=2)
            return jnp.concatenate([wrap, upper], axis=1).reshape(
                batch, seqlen, dim)

        y = jnp.zeros_like(xf)
        for i in range(width):
            y = y + w[2, i] * slice_shifted(width - 1 - i)
        outs.append(y)

    y = jnp.stack(outs)                                   # (G, b, L, dim)
    if bias is not None:
        y = y + bias.astype(jnp.float32)[:, None, None, :]
    if activation in ("silu", "swish"):
        y = jax.nn.silu(y)
    return y.astype(dtype)


def causal_conv1d_update(x_new, conv_state, weight, bias=None, activation=None):
    """Single-token decode step: shift the conv window and produce one output.

    Mirrors ``causal_conv1d_update``
    (causal-conv1d/causal_conv1d/causal_conv1d_interface.py:68-80), time-major.

    Args:
      x_new:      (batch, dim) incoming token.
      conv_state: (batch, width, dim) rolling window (oldest first).
      weight:     (width, dim); bias: (dim,) or None.
    Returns:
      (out (batch, dim), new_conv_state (batch, width, dim)).
    """
    if activation not in (None, "silu", "swish"):
        raise ValueError(f"unsupported activation {activation!r}")
    width = weight.shape[0]
    assert conv_state.shape[1] == width
    new_state = jnp.concatenate([conv_state[:, 1:], x_new[:, None, :]], axis=1)
    out = jnp.einsum("bwd,wd->bd", new_state.astype(jnp.float32),
                     weight.astype(jnp.float32))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if activation in ("silu", "swish"):
        out = jax.nn.silu(out)
    return out.astype(x_new.dtype), new_state
