"""Fused residual-add + LayerNorm/RMSNorm.

Rebuild of the reference Triton kernels ``layer_norm_fn`` / ``rms_norm_fn``
(/root/reference/mamba/mamba_ssm/ops/triton/layernorm.py:464-481). On TPU,
XLA fuses the residual add into the normalization reduction, so these are
plain jnp compositions with the same call surface (prenorm returning the
updated residual, optional fp32 residual carry).
"""

from __future__ import annotations

import jax.numpy as jnp


def _norm(x, weight, bias, eps, is_rms):
    xf = x.astype(jnp.float32)
    if is_rms:
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        normed = xf / jnp.sqrt(var + eps)
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        normed = (xf - mean) / jnp.sqrt(var + eps)
    out = normed * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def layer_norm_fn(x, weight, bias=None, residual=None, prenorm=False,
                  residual_in_fp32=False, eps=1e-6, is_rms_norm=False):
    """y = norm(x + residual); prenorm additionally returns the new residual
    (layernorm.py:464-476 semantics)."""
    if residual is not None:
        res = x.astype(jnp.float32) + residual.astype(jnp.float32)
    else:
        res = x.astype(jnp.float32)
    out = _norm(res, weight, bias, eps, is_rms_norm).astype(x.dtype)
    if prenorm:
        res_out = res if residual_in_fp32 else res.astype(x.dtype)
        return out, res_out
    return out


def rms_norm_fn(x, weight, bias=None, residual=None, prenorm=False,
                residual_in_fp32=False, eps=1e-6):
    return layer_norm_fn(x, weight, bias, residual, prenorm,
                         residual_in_fp32, eps, is_rms_norm=True)
