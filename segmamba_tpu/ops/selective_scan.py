"""Selective SSM scan — TPU-native implementations.

Computes, per batch ``b``, channel ``d``, state ``n`` and timestep ``t``::

    delta = softplus(delta_raw + delta_bias)           (optional)
    x[t]  = exp(delta[t] * A) * x[t-1] + delta[t] * B[t] * u[t]
    y[t]  = sum_n C[t, n] * x[t, n]  (+ D * u[t])      (skip connection)
    out   = y * silu(z)                                (optional gate)

Semantics match the reference CUDA op ``selective_scan_cuda.fwd/bwd``
(/root/reference/mamba/csrc/selective_scan/selective_scan.cpp:226,338) and its
pure-torch twin ``selective_scan_ref``
(/root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:86-152),
with one deliberate difference: this framework is time-major. Sequences are
``(batch, seqlen, dim)`` and time-varying B/C are ``(batch, seqlen, dstate)``
(the reference uses ``(batch, dim, seqlen)`` / ``(batch, 1, dstate, seqlen)``).
Time-major puts ``dim`` on TPU vector lanes and timesteps on sublanes, which is
the natural layout for both the Pallas kernel and the surrounding projections.

Three interchangeable cores:

- ``selective_scan_ref``     — exact sequential ``lax.scan`` (oracle; small L).
- ``selective_scan_chunked`` — two-level ``lax.associative_scan`` over chunks;
  pure XLA, differentiable, used on CPU and as a cross-check.
- ``selective_scan_pallas``  — Pallas TPU kernel with custom VJP
  (``scan_pallas.py``); the production path.

All cores compute the recurrence in float32 regardless of input dtype
(mirroring the reference kernel's float weight path,
selective_scan.cpp:235-236) and cast the output back to the input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _preprocess_delta(delta, delta_bias, delta_softplus):
    """Apply bias + softplus to raw dt, in float32.

    Mirrors selective_scan_ref (selective_scan_interface.py:104-107).
    """
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    return delta


def _postprocess(y, u, D, z, out_dtype):
    """D skip connection and silu(z) gating (selective_scan_interface.py:148-151)."""
    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Exact sequential reference core
# ---------------------------------------------------------------------------


def _wdtype(*arrs):
    """Weight compute dtype: complex64 if any operand is complex (the CUDA
    op's complex-weight path, selective_scan.cpp:235-262), else float32."""
    return (jnp.complex64 if any(jnp.iscomplexobj(a) for a in arrs)
            else jnp.float32)


def _expand_groups(M, dim):
    """Grouped time-varying B/C (batch, L, G, N) -> per-channel
    (batch, L, D, N), group-major: channel d uses group d // (D/G)
    (reference repeat "B G N L -> B (G H) N L",
    selective_scan_interface.py:128-131)."""
    G = M.shape[2]
    if dim % G:
        raise ValueError(f"dim={dim} not divisible by n_groups={G}")
    return jnp.repeat(M, dim // G, axis=2)


def _core_ref(u, delta, A, B, C):
    """Sequential lax.scan over time. u/delta: (B, L, D) f32; A: (D, N) real
    or complex; B, C: (B, L, N) time-varying, (B, L, G, N) grouped, or
    (D, N) static. Returns (y, last_state)."""
    batch, seqlen, dim = u.shape
    dstate = A.shape[1]
    if B.ndim == 4:
        B = _expand_groups(B, dim)  # (B, L, D, N)
    if C.ndim == 4:
        C = _expand_groups(C, dim)
    var_B = B.ndim >= 3
    var_C = C.ndim >= 3
    cdtype = _wdtype(A, B, C)

    deltaA = jnp.exp(delta[..., None] * A)  # (B, L, D, N)
    if not var_B:
        deltaBu = jnp.einsum("bld,dn,bld->bldn", delta, B, u)
    elif B.ndim == 3:
        deltaBu = delta[..., None] * B[:, :, None, :] * u[..., None]
    else:
        deltaBu = delta[..., None] * B * u[..., None]

    def step(x, inp):
        a, b, c = inp  # a, b: (B, D, N); c: (B, N) / (B, D, N) / placeholder
        x = a * x + b
        if not var_C:
            y = jnp.einsum("bdn,dn->bd", x, C)
        elif c.ndim == 2:
            y = jnp.einsum("bdn,bn->bd", x, c)
        else:
            y = jnp.einsum("bdn,bdn->bd", x, c)
        return x, y

    x0 = jnp.zeros((batch, dim, dstate), cdtype)
    # time-major scan inputs
    a_t = jnp.moveaxis(deltaA, 1, 0)
    b_t = jnp.moveaxis(deltaBu, 1, 0)
    c_t = (jnp.moveaxis(C, 1, 0) if var_C
           else jnp.zeros((seqlen, 1, 1), jnp.float32))
    last, ys = lax.scan(step, x0, (a_t, b_t, c_t))
    y = jnp.moveaxis(ys, 0, 1)  # (B, L, D)
    if jnp.iscomplexobj(y):
        y = 2.0 * y.real  # reference complex-output fold (:144)
    return y, last


# ---------------------------------------------------------------------------
# Chunked associative-scan core (pure XLA)
# ---------------------------------------------------------------------------


def _pair_combine(lhs, rhs):
    """First-order recurrence combine: (a, b) ∘ (a', b') = (a'a, a'b + b').

    Same decomposition as the reference CUDA kernel's cub BlockScan combine op
    (selective_scan_common.h:110-115).
    """
    a0, b0 = lhs
    a1, b1 = rhs
    return a1 * a0, a1 * b0 + b1


def _core_chunked(u, delta, A, B, C, chunk_size=128):
    """Two-level chunked scan: intra-chunk associative scan + inter-chunk
    carry scan. Differentiable pure-XLA fallback."""
    batch, seqlen, dim = u.shape
    dstate = A.shape[1]
    if B.ndim == 4:
        B = _expand_groups(B, dim)
    if C.ndim == 4:
        C = _expand_groups(C, dim)
    var_B = B.ndim >= 3
    var_C = C.ndim >= 3

    T = min(chunk_size, max(seqlen, 1))
    pad = (-seqlen) % T
    if pad:
        # delta=0 padding => a=1, b=0: identity elements, exact last_state.
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)))
        if var_B:
            B = jnp.pad(B, [(0, 0), (0, pad)] + [(0, 0)] * (B.ndim - 2))
        if var_C:
            C = jnp.pad(C, [(0, 0), (0, pad)] + [(0, 0)] * (C.ndim - 2))
    L = seqlen + pad
    nc = L // T

    a = jnp.exp(delta[..., None] * A)  # (B, L, D, N)
    if not var_B:
        b = jnp.einsum("bld,dn,bld->bldn", delta, B, u)
    elif B.ndim == 3:
        b = delta[..., None] * B[:, :, None, :] * u[..., None]
    else:
        b = delta[..., None] * B * u[..., None]
    a = a.reshape(batch, nc, T, dim, dstate)
    b = b.reshape(batch, nc, T, dim, dstate)

    # intra-chunk inclusive scan along T
    a_cum, b_cum = lax.associative_scan(_pair_combine, (a, b), axis=2)
    # inter-chunk scan of chunk-exit states
    ac, bc = a_cum[:, :, -1], b_cum[:, :, -1]  # (B, nc, D, N)
    _, carry_inc = lax.associative_scan(_pair_combine, (ac, bc), axis=1)
    last_state = carry_inc[:, -1]
    carry_in = jnp.concatenate(
        [jnp.zeros_like(carry_inc[:, :1]), carry_inc[:, :-1]], axis=1
    )  # entry state per chunk
    x = b_cum + a_cum * carry_in[:, :, None]  # (B, nc, T, D, N)
    x = x.reshape(batch, L, dim, dstate)
    if not var_C:
        y = jnp.einsum("bldn,dn->bld", x, C)
    elif C.ndim == 3:
        y = jnp.einsum("bldn,bln->bld", x, C)
    else:
        y = jnp.einsum("bldn,bldn->bld", x, C)
    if jnp.iscomplexobj(y):
        y = 2.0 * y.real  # reference complex-output fold
    if pad:
        y = y[:, :seqlen]
    return y, last_state


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def selective_scan_ref(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                       delta_softplus=False, return_last_state=False):
    """Exact sequential selective scan (test oracle).

    Args:
      u:      (batch, seqlen, dim) input sequence.
      delta:  (batch, seqlen, dim) raw timestep.
      A:      (dim, dstate) state matrix — real (negative for stability) or
              complex64 (the CUDA op's complex-weight S4 path,
              selective_scan.cpp:235-262; complex output folds as 2*Re).
      B, C:   (batch, seqlen, dstate) time-varying,
              (batch, seqlen, n_groups, dstate) grouped (channel d uses
              group d // (dim/n_groups), selective_scan.cpp:251-262), or
              (dim, dstate) static; real or complex.
      D:      (dim,) optional skip.
      z:      (batch, seqlen, dim) optional silu gate.
      delta_bias: (dim,) added to delta before softplus.
      delta_softplus: apply softplus to delta.
    Returns:
      out (batch, seqlen, dim), and last_state (batch, dim, dstate) if
      ``return_last_state`` (complex when the weights are).
    """
    out_dtype = u.dtype
    uf = u.astype(jnp.float32)
    d = _preprocess_delta(delta, delta_bias, delta_softplus)
    y, last = _core_ref(uf, d, A.astype(_wdtype(A)),
                        B.astype(_wdtype(B)), C.astype(_wdtype(C)))
    out = _postprocess(y, u, D, z, out_dtype)
    return (out, last) if return_last_state else out


def selective_scan_chunked(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                           delta_softplus=False, return_last_state=False,
                           chunk_size=128):
    """Chunked associative-scan selective scan (pure XLA, differentiable).
    Same surface as ``selective_scan_ref`` incl. grouped and complex B/C."""
    out_dtype = u.dtype
    uf = u.astype(jnp.float32)
    d = _preprocess_delta(delta, delta_bias, delta_softplus)
    y, last = _core_chunked(uf, d, A.astype(_wdtype(A)),
                            B.astype(_wdtype(B)), C.astype(_wdtype(C)),
                            chunk_size=chunk_size)
    out = _postprocess(y, u, D, z, out_dtype)
    return (out, last) if return_last_state else out


def selective_scan(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                   delta_softplus=False, return_last_state=False,
                   impl="auto", chunk_size=128):
    """Selective scan with implementation dispatch.

    ``impl``: "auto" (Pallas on TPU, chunked elsewhere), "pallas", "chunked",
    or "ref".
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "chunked"
    if impl in ("pallas", "mxu") and (
            B.ndim != 3 or C.ndim != 3
            or any(jnp.iscomplexobj(a) for a in (A, B, C))):
        # static / grouped / complex B-C are off the model hot path
        # (SegMamba always runs G=1 real time-varying); the XLA core
        # covers the full CUDA-op surface (selective_scan.cpp:235-262)
        impl = "chunked"
    if impl == "ref":
        return selective_scan_ref(u, delta, A, B, C, D, z, delta_bias,
                                  delta_softplus, return_last_state)
    if impl == "chunked":
        return selective_scan_chunked(u, delta, A, B, C, D, z, delta_bias,
                                      delta_softplus, return_last_state,
                                      chunk_size=chunk_size)
    if impl == "pallas":
        from segmamba_tpu.ops.scan_pallas import selective_scan_pallas
        return selective_scan_pallas(u, delta, A, B, C, D, z, delta_bias,
                                     delta_softplus, return_last_state,
                                     chunk_size=chunk_size)
    if impl == "mxu":
        from segmamba_tpu.ops.scan_pallas_mxu import selective_scan_mxu
        return selective_scan_mxu(u, delta, A, B, C, D, z, delta_bias,
                                  delta_softplus, return_last_state,
                                  chunk_size=chunk_size)
    raise ValueError(f"unknown selective_scan impl: {impl!r}")
