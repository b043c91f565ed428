"""Single-step SSM recurrence for autoregressive decoding.

Rebuild of the reference Triton kernel ``selective_state_update``
(/root/reference/mamba/mamba_ssm/ops/triton/selective_state_update.py:16-110
and its ``selective_state_update_ref`` :113-152): one decode step

    dt    = softplus(dt + dt_bias)            (optional)
    state = state * exp(dt * A) + dt * B * x
    y     = sum_n C_n * state_n + D * x
    out   = y * silu(z)                       (optional)

On TPU this is a handful of fused elementwise ops + a tiny contraction; a
jitted jnp composition is already bandwidth-bound, so no Pallas kernel is
needed. Functional: returns (out, new_state) instead of updating in place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def selective_state_update(state, x, dt, A, B, C, D=None, z=None,
                           dt_bias=None, dt_softplus=False):
    """Args:
      state: (batch, dim, dstate) running SSM state.
      x:     (batch, dim) current token features.
      dt:    (batch, dim) raw timestep.
      A:     (dim, dstate); B, C: (batch, dstate); D: (dim,); z: (batch, dim).
    Returns:
      (out (batch, dim), new_state (batch, dim, dstate)), out in x.dtype.
    """
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    d = dt.astype(jnp.float32)
    if dt_bias is not None:
        d = d + dt_bias.astype(jnp.float32)
    if dt_softplus:
        d = jax.nn.softplus(d)
    dA = jnp.exp(d[..., None] * A.astype(jnp.float32))        # (b, d, n)
    dBx = d[..., None] * B.astype(jnp.float32)[:, None, :] * xf[..., None]
    new_state = state.astype(jnp.float32) * dA + dBx
    y = jnp.einsum("bdn,bn->bd", new_state, C.astype(jnp.float32))
    if D is not None:
        y = y + D.astype(jnp.float32) * xf
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(out_dtype), new_state.astype(state.dtype)
