"""MXU-assisted Pallas selective-scan kernel (ratio-form sub-block scan).

The baseline kernel (``scan_pallas.py``) computes the first-order recurrence
with a Hillis-Steele pair scan: ~log2(T) shifted-FMA passes over the full
``(dstate, T, Dblk)`` tile per chunk, VPU-bound (measured ~5.7 ms per
262k-token row on v5e — the profile floor of the whole model, PROGRESS.md).
This kernel moves the scan's combine work onto the MXU.

Within a sub-block of ``S`` timesteps anchored at the sub-block entry, with
per-step log-decay ``s[t] = delta[t]*A`` (reference discretization,
selective_scan_common.h:110-115)::

    l[t] = in-block cumsum(s)[t]          P[t] = exp(l[t])
    x_blk[t] = P[t] * sum_{s<=t, same blk} b[s] / P[s]
    x[t]     = x_blk[t] + P[t] * carry_into_block

Both in-block cumulative sums are block-diagonal lower-triangular matmuls
``L_blk @ v`` batched over the state dimension — MXU work — and carries chain
across the T/S sub-blocks with a tiny sequential product-form loop (products
only, no overflow). This replaces ~26 elementwise VPU pass-equivalents per
chunk with ~10 plus a handful of matmuls.

Numerical range: ``1/P`` spans at most the *in-sub-block* decay ``e^drop``
where ``drop = sum_{t in S} |delta[t]*A|``. The public op guards exactly:
two cheap XLA reductions bound the worst sub-block drop and ``lax.cond``
dispatches to the Hillis-Steele kernel if the ratio form could overflow
(``MAX_BLOCK_DROP``), so semantics are exact for ALL inputs. At the default
``S=16`` the guard engages only past per-step ``delta*|A| > 4.7`` — far
outside trained-model ranges (dt init [0.001, 0.1], mamba_simple.py:98-108).

Matmul precision is HIGHEST: Mosaic's DEFAULT f32 matmul truncates operands
to bf16 (repo verify-skill notes), which would break the reference f32
tolerance tiers (test_selective_scan.py:45-47).

Same contract, layouts, grid and chunk-carry scheme as ``scan_pallas.py``.
The backward recomputes in-chunk states from stored chunk-entry states (the
CUDA backward's reverse-scan recompute, selective_scan_bwd_kernel.cuh:19,59)
and evaluates the adjoint ``g[t] = dx[t] + a[t+1] g[t+1]`` in the same
sub-block ratio form with upper-triangular matmuls.

MEASURED OUTCOME (v5e, 262144x96xN16 row, 2026-08-17): the MXU form LOSES —
fwd 14.5 ms vs 6.1 ms for the Hillis-Steele kernel; fwd+bwd 37.0 vs 16.3 ms;
and with ``guarded=True`` realistic softplus-delta magnitudes trip the
overflow guard (softplus maps even small pre-activations to delta ~0.7;
x 16-step sub-block x |A|<=16 gives log-drops ~180 >> 75), so real model
data routes to Hillis-Steele regardless. Root causes, recorded so later
rounds don't re-litigate: (a) Mamba-1's decay varies per (state, channel)
pair, so the SSD-style segsum/matmul trick needs the ratio factorization
``P[t]/P[s]``, which overflows f32 outside toy delta ranges — there is no
per-(n,d) stable matmul form; (b) even in-range, HIGHEST-precision f32
triangular matmuls on the (T, T) mask cost more than the ~16 saved VPU
passes on v5e. The kernel stays available as ``impl="mxu"`` (exact via the
guard) but the Hillis-Steele kernel remains the default on merit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segmamba_tpu.ops.scan_pallas import (
    DEF_CHUNK,
    _bwd_call,
    _fwd_call,
    _pick_dblock,
    _round_up,
)
from segmamba_tpu.ops.selective_scan import _postprocess, _preprocess_delta

# Largest in-sub-block log-decay drop before 1/P leaves f32 range
# (exp(88) overflows; leave headroom for the b magnitudes).
MAX_BLOCK_DROP = 75.0
DEF_SUB = 16
_PREC = lax.Precision.HIGHEST


def _masks(T, S):
    """Block-diagonal triangular (lower, upper) f32 mask matrices and the
    (T, K=T/S) carry-broadcast selector."""
    row = lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = lax.broadcasted_iota(jnp.int32, (T, T), 1)
    same = (row // S) == (col // S)
    lo = ((row >= col) & same).astype(jnp.float32)
    up = ((row <= col) & same).astype(jnp.float32)
    K = T // S
    r2 = lax.broadcasted_iota(jnp.int32, (T, K), 0)
    c2 = lax.broadcasted_iota(jnp.int32, (T, K), 1)
    exp_sel = ((r2 // S) == c2).astype(jnp.float32)
    return lo, up, exp_sel


def _mm(M, v):
    """Batched MXU matmul over the leading state axis: out[n] = M @ v[n]
    with ``M (T_out, T_in)`` and ``v (N, T_in, D)``."""
    N = v.shape[0]
    Mb = jnp.broadcast_to(M[None], (N,) + M.shape)
    return lax.dot_general(
        Mb, v, (((2,), (1,)), ((0,), (0,))),
        precision=_PREC, preferred_element_type=jnp.float32)


def _block_scan(P, q, lo, exp_sel, carry0, T, S):
    """States from sub-block scans + carry chain.

    P, q: (N, T, D) with ``P`` the in-block cumulative decay and ``q`` the
    ratio-form inputs ``b/P``. carry0: (N, D) state entering the chunk.
    Returns x (N, T, D)."""
    x_blk = P * _mm(lo, q)                    # zero-entry in-block states
    K = T // S
    # carry chain across sub-blocks: c_{k+1} = Pend_k * c_k + Xend_k
    carries = []
    c = carry0
    for k in range(K):
        carries.append(c[:, None, :])
        c = P[:, k * S + S - 1] * c + x_blk[:, k * S + S - 1]
    carry_in = jnp.concatenate(carries, axis=1)          # (N, K, D)
    carry_full = _mm(exp_sel, carry_in)                  # (N, T, D)
    return x_blk + P * carry_full, c


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(S, u_ref, d_ref, At_ref, Bt_ref, Ct_ref, y_ref, st_ref,
                carry_ref):
    T = u_ref.shape[1]
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

    u = u_ref[0].astype(jnp.float32)          # (T, Dblk)
    delta = d_ref[0].astype(jnp.float32)      # (T, Dblk)
    At = At_ref[...].astype(jnp.float32)      # (N, Dblk)
    Bt = Bt_ref[0].astype(jnp.float32)        # (N, T)
    Ct = Ct_ref[0].astype(jnp.float32)        # (N, T)
    lo, _, exp_sel = _masks(T, S)

    sv = delta[None] * At[:, None, :]                    # (N, T, Dblk)
    ell = _mm(lo, sv)                                    # in-block cum log-decay
    P = jnp.exp(ell)
    # clamp is a NaN-guard only: the dispatcher routes overflowing inputs
    # to the Hillis-Steele kernel.
    Pinv = jnp.exp(-jnp.maximum(ell, -MAX_BLOCK_DROP - 10.0))
    b = (delta * u)[None] * Bt[:, :, None]               # (N, T, Dblk)
    x, cnew = _block_scan(P, b * Pinv, lo, exp_sel, carry_ref[...], T, S)
    y_ref[0] = jnp.sum(Ct[:, :, None] * x, axis=0).astype(y_ref.dtype)
    carry_ref[...] = cnew
    st_ref[0, 0] = cnew


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(S, u_ref, d_ref, At_ref, Bt_ref, Ct_ref, dy_ref, dlast_ref,
                ent_ref, du_ref, dd_ref, dA_ref, dB_ref, dC_ref, gcarry_ref):
    T = u_ref.shape[1]
    c = pl.program_id(2)
    nc = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        gcarry_ref[...] = dlast_ref[0].astype(jnp.float32)
        dA_ref[...] = jnp.zeros(dA_ref.shape, dA_ref.dtype)

    u = u_ref[0].astype(jnp.float32)
    delta = d_ref[0].astype(jnp.float32)
    At = At_ref[...].astype(jnp.float32)
    Bt = Bt_ref[0].astype(jnp.float32)
    Ct = Ct_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)                   # (T, Dblk)
    lo, up, exp_sel = _masks(T, S)

    sv = delta[None] * At[:, None, :]
    ell = _mm(lo, sv)
    P = jnp.exp(ell)
    Pinv = jnp.exp(-jnp.maximum(ell, -MAX_BLOCK_DROP - 10.0))
    du_ = delta * u
    b = du_[None] * Bt[:, :, None]

    # recompute in-chunk states from the stored chunk-entry state
    entry = ent_ref[0, 0].astype(jnp.float32)
    Nn, Dblk = gcarry_ref.shape
    entry = jnp.where(c == nc - 1, jnp.zeros_like(entry), entry)
    x, _ = _block_scan(P, b * Pinv, lo, exp_sel, entry, T, S)
    x_prev = jnp.concatenate([entry[:, None, :], x[:, 0:T - 1]], axis=1)
    # per-step decay a[t] = P[t] / P[t-1] within a block; at block starts
    # P[t-1] belongs to the previous block, so recompute a = exp(sv) there.
    a_in = P * jnp.concatenate(
        [jnp.ones_like(Pinv[:, 0:1]), Pinv[:, 0:T - 1]], axis=1)
    tmask = (lax.broadcasted_iota(jnp.int32, (T, 1), 0) % S == 0)
    a = jnp.where(tmask[None], jnp.exp(sv), a_in)

    # adjoint g[t] = dx[t] + a[t+1] g[t+1], tail carry beyond t = T-1.
    # In-block ratio form: g_blk = Pinv * upper_mm(P * dx); carries chain
    # backwards across sub-blocks with products only.
    dx = Ct[:, :, None] * dy[None]
    g_blk = Pinv * _mm(up, P * dx)
    K = T // S
    # adjoint entering block k from the right: gin_K-1 = chunk gcarry;
    # gin_{k-1} = a[start of k] * g[start of k]
    gins = [None] * K
    gin = gcarry_ref[...]
    for k in range(K - 1, -1, -1):
        gins[k] = gin[:, None, :]
        g_start = (g_blk[:, k * S]
                   + Pinv[:, k * S] * P[:, k * S + S - 1] * gin)
        gin = a[:, k * S] * g_start
    gin_rows = jnp.concatenate(gins, axis=1)             # (N, K, D)
    # g[t] = g_blk[t] + Pinv[t] * Pend_blk * gin_blk
    pend = jnp.concatenate(
        [P[:, k * S + S - 1:k * S + S] * gin_rows[:, k:k + 1]
         for k in range(K)], axis=1)                     # (N, K, D)
    g = g_blk + Pinv * _mm(exp_sel, pend)
    gcarry_ref[...] = gin

    dp = g * x_prev * a                                  # adjoint of delta*A
    Ssum = jnp.sum(g * Bt[:, :, None], axis=0)           # (T, Dblk)
    du_ref[0] = (Ssum * delta).astype(du_ref.dtype)
    dd_ref[0] = (jnp.sum(dp * At[:, None, :], axis=0)
                 + Ssum * u).astype(dd_ref.dtype)
    dA_ref[0, 0] += jnp.sum(dp * delta[None], axis=1)
    dB_ref[0, 0] = jnp.sum(g * du_[None], axis=2).astype(dB_ref.dtype)
    dC_ref[0, 0] = jnp.sum(x * dy[None], axis=2).astype(dC_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers (same grid/specs as scan_pallas)
# ---------------------------------------------------------------------------


def _interpret():
    return jax.default_backend() != "tpu"


def _fwd_call_mxu(u, delta, At, Bt, Ct, T, Dblk, S):
    batch, L, D = u.shape
    N = At.shape[0]
    nc, nd = L // T, D // Dblk
    grid = (batch, nd, nc)
    y, states = pl.pallas_call(
        functools.partial(_fwd_kernel, S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, c, d)),
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, c, d)),
            pl.BlockSpec((N, Dblk), lambda b, d, c: (0, d)),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, c)),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, c)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, c, d)),
            pl.BlockSpec((1, 1, N, Dblk), lambda b, d, c: (b, c, 0, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, L, D), jnp.float32),
            jax.ShapeDtypeStruct((batch, nc, N, D), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, Dblk), jnp.float32)],
        interpret=_interpret(),
    )(u, delta, At, Bt, Ct)
    return y, states


def _bwd_call_mxu(u, delta, At, Bt, Ct, dy, dlast, states, T, Dblk, S):
    batch, L, D = u.shape
    N = At.shape[0]
    nc, nd = L // T, D // Dblk
    grid = (batch, nd, nc)

    def rev(c):
        return nc - 1 - c

    du, dd, dA_part, dB_part, dC_part = pl.pallas_call(
        functools.partial(_bwd_kernel, S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, rev(c), d)),
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, rev(c), d)),
            pl.BlockSpec((N, Dblk), lambda b, d, c: (0, d)),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, rev(c))),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, rev(c))),
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, rev(c), d)),
            pl.BlockSpec((1, N, Dblk), lambda b, d, c: (b, 0, d)),
            pl.BlockSpec((1, 1, N, Dblk),
                         lambda b, d, c: (b, jnp.maximum(rev(c) - 1, 0), 0, d)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, rev(c), d)),
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, rev(c), d)),
            pl.BlockSpec((1, 1, N, Dblk), lambda b, d, c: (b, d, 0, 0)),
            pl.BlockSpec((1, 1, N, T), lambda b, d, c: (d, b, 0, rev(c))),
            pl.BlockSpec((1, 1, N, T), lambda b, d, c: (d, b, 0, rev(c))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, L, D), jnp.float32),
            jax.ShapeDtypeStruct((batch, L, D), jnp.float32),
            jax.ShapeDtypeStruct((batch, nd, N, Dblk), jnp.float32),
            jax.ShapeDtypeStruct((nd, batch, N, L), jnp.float32),
            jax.ShapeDtypeStruct((nd, batch, N, L), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, Dblk), jnp.float32)],
        interpret=_interpret(),
    )(u, delta, At, Bt, Ct, dy, dlast, states)
    dAt = jnp.moveaxis(jnp.sum(dA_part, axis=0), 0, 1).reshape(N, D)
    dBt = jnp.sum(dB_part, axis=0)
    dCt = jnp.sum(dC_part, axis=0)
    return du, dd, dAt, dBt, dCt


# ---------------------------------------------------------------------------
# guarded custom-vjp core
# ---------------------------------------------------------------------------


def _block_drop(delta, At, S):
    """Exact worst in-sub-block log-decay drop for softplus-positive delta
    (an upper bound otherwise): per channel, the largest sub-block sum of
    |delta| times the largest |A| over states."""
    batch, L, D = delta.shape
    dsum = jnp.sum(jnp.abs(delta).reshape(batch, L // S, S, D), axis=2)
    return jnp.max(jnp.max(dsum, axis=(0, 1)) * jnp.max(jnp.abs(At), axis=0))


@functools.lru_cache(maxsize=None)
def _make_core(T, Dblk, S, guarded):
    @jax.custom_vjp
    def core(u, delta, At, Bt, Ct):
        y, states = _fwd(u, delta, At, Bt, Ct)
        return y, states[:, -1]

    def _fwd(u, delta, At, Bt, Ct):
        if not guarded:
            return _fwd_call_mxu(u, delta, At, Bt, Ct, T, Dblk, S)
        safe = _block_drop(delta, At, S) < MAX_BLOCK_DROP
        return lax.cond(
            safe,
            lambda ops: _fwd_call_mxu(*ops, T, Dblk, S),
            lambda ops: _fwd_call(*ops, T, Dblk),
            (u, delta, At, Bt, Ct))

    def core_fwd(u, delta, At, Bt, Ct):
        y, states = _fwd(u, delta, At, Bt, Ct)
        return (y, states[:, -1]), (u, delta, At, Bt, Ct, states)

    def core_bwd(res, cts):
        u, delta, At, Bt, Ct, states = res
        dy, dlast = cts
        args = (u, delta, At, Bt, Ct, dy.astype(jnp.float32),
                dlast.astype(jnp.float32), states)
        if not guarded:
            return _bwd_call_mxu(*args, T, Dblk, S)
        safe = _block_drop(delta, At, S) < MAX_BLOCK_DROP
        return lax.cond(
            safe,
            lambda ops: _bwd_call_mxu(*ops, T, Dblk, S),
            lambda ops: _bwd_call(*ops, T, Dblk),
            args)

    core.defvjp(core_fwd, core_bwd)
    return core


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def selective_scan_mxu(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                       delta_softplus=False, return_last_state=False,
                       chunk_size=DEF_CHUNK, d_block=256, sub_block=DEF_SUB,
                       guarded=True):
    """Selective scan via the MXU ratio-form kernel, with exact-semantics
    guard (falls back to the Hillis-Steele kernel when the in-sub-block decay
    would overflow the ratio form). Same contract as ``selective_scan_ref``."""
    if B.ndim != 3 or C.ndim != 3:
        raise ValueError("pallas selective scan requires time-varying B and C")
    batch, seqlen, dim = u.shape
    dstate = A.shape[1]
    if dstate > 256:
        raise ValueError("dstate must be <= 256 (reference selective_scan.cpp:262)")
    out_dtype = u.dtype

    uf = u.astype(jnp.float32)
    d = _preprocess_delta(delta, delta_bias, delta_softplus)

    T = min(chunk_size, _round_up(seqlen, 8))
    if T < 128 and _round_up(seqlen, 8) > T:
        T = min(128, _round_up(seqlen, 8))
    S = min(sub_block, T)
    if T % S:
        S = T  # degenerate short-sequence case: one sub-block
    Dblk = _pick_dblock(dim, d_block)
    pad_l = (-seqlen) % T
    pad_d = (-dim) % Dblk
    if pad_l or pad_d:
        uf = jnp.pad(uf, ((0, 0), (0, pad_l), (0, pad_d)))
        d = jnp.pad(d, ((0, 0), (0, pad_l), (0, pad_d)))
    Af = A.astype(jnp.float32)
    if pad_d:
        Af = jnp.pad(Af, ((0, pad_d), (0, 0)))
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)
    if pad_l:
        Bf = jnp.pad(Bf, ((0, 0), (0, pad_l), (0, 0)))
        Cf = jnp.pad(Cf, ((0, 0), (0, pad_l), (0, 0)))

    At = Af.T
    Bt = jnp.swapaxes(Bf, 1, 2)
    Ct = jnp.swapaxes(Cf, 1, 2)

    core = _make_core(T, Dblk, S, guarded)
    y, last = core(uf, d, At, Bt, Ct)
    y = y[:, :seqlen, :dim]
    out = _postprocess(y, u, D, z, out_dtype)
    if return_last_state:
        return out, jnp.swapaxes(last, 1, 2)[:, :dim]
    return out
