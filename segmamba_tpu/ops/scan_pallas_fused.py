"""Fully-fused gated selective scan (Pallas TPU): one HBM pass.

Where the generic kernel (scan_pallas.py) computes only the recurrence and
leaves softplus / D-skip / silu(z) gating to XLA, this kernel fuses the whole
tail of ``mamba_inner`` exactly like the reference CUDA kernel does
(/root/reference/mamba/csrc/selective_scan/selective_scan_fwd_kernel.cuh —
delta softplus + bias in-kernel, fused ``y·silu(z)`` out gate;
selective_scan.cpp:226-336):

    delta = softplus(dt + dt_bias)
    x[t]  = exp(delta A) x[t-1] + delta B[t] u[t]
    out   = (C[t]·x[t] + D u[t]) · silu(z[t])

Inputs stay in their storage dtype (bf16 in the model) end to end — the f32
conversion happens on VMEM tiles inside the kernel, cutting HBM traffic by
~4x vs the unfused path. The backward re-derives every gradient (u, dt, z,
A, B, C, D; dt_bias reduced outside) from the saved per-chunk states, like
the CUDA backward's recompute strategy (selective_scan_bwd_kernel.cuh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segmamba_tpu.ops.scan_pallas import (
    DEF_CHUNK,
    DEF_DBLOCK,
    _hs_fwd_b,
    _hs_rev_v,
    _interpret,
    _pick_dblock,
    _round_up,
    _shift_up,
)


def _fwd_kernel(u_ref, dt_ref, z_ref, At_ref, Bt_ref, Ct_ref, bias_ref,
                Dv_ref, out_ref, st_ref, carry_ref):
    T = u_ref.shape[1]
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

    u = u_ref[0].astype(jnp.float32)                    # (T, Dblk)
    delta = jax.nn.softplus(dt_ref[0].astype(jnp.float32)
                            + bias_ref[0, 0].astype(jnp.float32))
    z = z_ref[0].astype(jnp.float32)
    At = At_ref[0].astype(jnp.float32)                  # (N, Dblk)
    Bt = Bt_ref[0].astype(jnp.float32)                  # (N, T)
    Ct = Ct_ref[0].astype(jnp.float32)

    a = jnp.exp(delta[None] * At[:, None, :])           # (N, T, Dblk)
    b = (delta * u)[None] * Bt[:, :, None]
    carry = carry_ref[...][:, None, :]
    b = jnp.concatenate([b[:, 0:1] + a[:, 0:1] * carry, b[:, 1:]], axis=1)
    x = _hs_fwd_b(a, b, T, axis=1)
    y = jnp.sum(Ct[:, :, None] * x, axis=0)             # (T, Dblk)
    ytot = y + Dv_ref[0, 0].astype(jnp.float32) * u
    out_ref[0] = (ytot * (z * jax.nn.sigmoid(z))).astype(out_ref.dtype)

    N, Dblk = carry_ref.shape
    carry_ref[...] = x[:, T - 1:T].reshape(N, Dblk)
    st_ref[0, 0] = carry_ref[...]


def _bwd_kernel(u_ref, dt_ref, z_ref, At_ref, Bt_ref, Ct_ref, bias_ref,
                Dv_ref, dout_ref, ent_ref, du_ref, ddt_ref, dz_ref, dA_ref,
                dB_ref, dC_ref, dD_ref, gcarry_ref):
    T = u_ref.shape[1]
    c = pl.program_id(2)
    nc = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        gcarry_ref[...] = jnp.zeros(gcarry_ref.shape, gcarry_ref.dtype)
        dA_ref[...] = jnp.zeros(dA_ref.shape, dA_ref.dtype)
        dD_ref[...] = jnp.zeros(dD_ref.shape, dD_ref.dtype)

    u = u_ref[0].astype(jnp.float32)
    dt_raw = dt_ref[0].astype(jnp.float32) + bias_ref[0, 0].astype(jnp.float32)
    delta = jax.nn.softplus(dt_raw)
    z = z_ref[0].astype(jnp.float32)
    At = At_ref[0].astype(jnp.float32)
    Bt = Bt_ref[0].astype(jnp.float32)
    Ct = Ct_ref[0].astype(jnp.float32)
    Dv = Dv_ref[0, 0].astype(jnp.float32)
    dout = dout_ref[0].astype(jnp.float32)

    # recompute states from the stored chunk-entry state
    a = jnp.exp(delta[None] * At[:, None, :])
    du_ = delta * u
    b = du_[None] * Bt[:, :, None]
    entry = ent_ref[0, 0].astype(jnp.float32)[:, None, :]
    entry = jnp.where(c == nc - 1, jnp.zeros_like(entry), entry)
    bs = jnp.concatenate([b[:, 0:1] + a[:, 0:1] * entry, b[:, 1:]], axis=1)
    x = _hs_fwd_b(a, bs, T, axis=1)
    x_prev = jnp.concatenate([entry, x[:, 0:T - 1]], axis=1)
    y = jnp.sum(Ct[:, :, None] * x, axis=0)
    ytot = y + Dv * u

    # gate chain: out = ytot * silu(z)
    sig = jax.nn.sigmoid(z)
    silu = z * sig
    dy = dout * silu                                    # d(ytot)
    dz_ref[0] = (dout * ytot * (sig + silu * (1.0 - sig))).astype(
        dz_ref.dtype)
    dD_ref[0, 0] += jnp.sum(dy * u, axis=0, keepdims=True)

    # adjoint recurrence
    dx = Ct[:, :, None] * dy[None]
    m = _shift_up(a, 1, 1.0)
    tail = jnp.concatenate(
        [jnp.zeros(dx.shape[:1] + (T - 1,) + dx.shape[2:], jnp.float32),
         gcarry_ref[...][:, None, :]], axis=1)
    g = _hs_rev_v(m, dx + tail, T, axis=1)
    N, Dblk = gcarry_ref.shape
    gcarry_ref[...] = (a[:, 0:1] * g[:, 0:1]).reshape(N, Dblk)

    dp = g * x_prev * a
    S = jnp.sum(g * Bt[:, :, None], axis=0)             # d(delta*u)
    ddelta = jnp.sum(dp * At[:, None, :], axis=0) + S * u
    # softplus chain: d(dt_raw) = ddelta * sigmoid(dt_raw)
    ddt_ref[0] = (ddelta * jax.nn.sigmoid(dt_raw)).astype(ddt_ref.dtype)
    du_ref[0] = (S * delta + dy * Dv).astype(du_ref.dtype)
    dA_ref[0, 0] += jnp.sum(dp * delta[None], axis=1)
    dB_ref[0, 0] = jnp.sum(g * du_[None], axis=2).astype(dB_ref.dtype)
    dC_ref[0, 0] = jnp.sum(x * dy[None], axis=2).astype(dC_ref.dtype)


def _fwd_call(u, dt, z, At, Bt, Ct, bias, Dv, T, Dblk):
    batch, L, D = u.shape
    G, N = At.shape[0], At.shape[1]
    nc, nd = L // T, D // Dblk
    gidx = (lambda b, d, c: (b, 0, d)) if G == batch else         (lambda b, d, c: (0, 0, d))
    seq_spec = pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, c, d))
    vec_spec = pl.BlockSpec((1, 1, Dblk), gidx)
    out, states = pl.pallas_call(
        _fwd_kernel,
        grid=(batch, nd, nc),
        in_specs=[
            seq_spec, seq_spec, seq_spec,
            pl.BlockSpec((1, N, Dblk), gidx),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, c)),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, c)),
            vec_spec, vec_spec,
        ],
        out_specs=[
            seq_spec,
            pl.BlockSpec((1, 1, N, Dblk), lambda b, d, c: (b, c, 0, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, L, D), u.dtype),
            jax.ShapeDtypeStruct((batch, nc, N, D), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, Dblk), jnp.float32)],
        interpret=_interpret(),
    )(u, dt, z, At, Bt, Ct, bias, Dv)
    return out, states


def _bwd_call(u, dt, z, At, Bt, Ct, bias, Dv, dout, states, T, Dblk):
    batch, L, D = u.shape
    G, N = At.shape[0], At.shape[1]
    nc, nd = L // T, D // Dblk

    def rev(c):
        return nc - 1 - c

    gidx = (lambda b, d, c: (b, 0, d)) if G == batch else         (lambda b, d, c: (0, 0, d))
    seq_rev = pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, rev(c), d))
    vec_spec = pl.BlockSpec((1, 1, Dblk), gidx)
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(batch, nd, nc),
        in_specs=[
            seq_rev, seq_rev, seq_rev,
            pl.BlockSpec((1, N, Dblk), gidx),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, rev(c))),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, rev(c))),
            vec_spec, vec_spec,
            seq_rev,
            pl.BlockSpec((1, 1, N, Dblk),
                         lambda b, d, c: (b, jnp.maximum(rev(c) - 1, 0), 0, d)),
        ],
        out_specs=[
            seq_rev, seq_rev, seq_rev,
            pl.BlockSpec((1, 1, N, Dblk), lambda b, d, c: (b, d, 0, 0)),
            pl.BlockSpec((1, 1, N, T), lambda b, d, c: (d, b, 0, rev(c))),
            pl.BlockSpec((1, 1, N, T), lambda b, d, c: (d, b, 0, rev(c))),
            pl.BlockSpec((1, 1, 1, Dblk), lambda b, d, c: (b, d, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, L, D), jnp.float32),
            jax.ShapeDtypeStruct((batch, L, D), jnp.float32),
            jax.ShapeDtypeStruct((batch, L, D), jnp.float32),
            jax.ShapeDtypeStruct((batch, nd, N, Dblk), jnp.float32),
            jax.ShapeDtypeStruct((nd, batch, N, L), jnp.float32),
            jax.ShapeDtypeStruct((nd, batch, N, L), jnp.float32),
            jax.ShapeDtypeStruct((batch, nd, 1, Dblk), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, Dblk), jnp.float32)],
        interpret=_interpret(),
    )(u, dt, z, At, Bt, Ct, bias, Dv, dout, states)
    du, ddt, dz, dA_p, dB_p, dC_p, dD_p = outs
    if G == batch:  # per-batch parameters
        dAt = jnp.moveaxis(dA_p, 1, 2).reshape(batch, N, D)
        dDv = dD_p.reshape(batch, 1, D)
        dbias = jnp.sum(ddt, axis=1).reshape(batch, 1, D)
    else:
        dAt = jnp.moveaxis(jnp.sum(dA_p, axis=0), 0, 1).reshape(1, N, D)
        dDv = jnp.sum(dD_p, axis=(0, 2)).reshape(1, 1, D)
        dbias = jnp.sum(ddt, axis=(0, 1)).reshape(1, 1, D)
    dBt = jnp.sum(dB_p, axis=0)
    dCt = jnp.sum(dC_p, axis=0)
    return du, ddt, dz, dAt, dBt, dCt, dDv, dbias


@functools.lru_cache(maxsize=None)
def _make_core(T, Dblk):
    @jax.custom_vjp
    def core(u, dt, z, At, Bt, Ct, bias, Dv):
        out, _ = _fwd_call(u, dt, z, At, Bt, Ct, bias, Dv, T, Dblk)
        return out

    def core_fwd(u, dt, z, At, Bt, Ct, bias, Dv):
        out, states = _fwd_call(u, dt, z, At, Bt, Ct, bias, Dv, T, Dblk)
        return out, (u, dt, z, At, Bt, Ct, bias, Dv, states)

    def core_bwd(res, dout):
        u, dt, z, At, Bt, Ct, bias, Dv, states = res
        du, ddt, dz, dAt, dBt, dCt, dDv, dbias = _bwd_call(
            u, dt, z, At, Bt, Ct, bias, Dv, dout.astype(jnp.float32),
            states, T, Dblk)
        return (du.astype(u.dtype), ddt.astype(dt.dtype), dz.astype(z.dtype),
                dAt.astype(At.dtype), dBt.astype(Bt.dtype),
                dCt.astype(Ct.dtype), dbias.astype(bias.dtype),
                dDv.astype(Dv.dtype))

    core.defvjp(core_fwd, core_bwd)
    return core


def mamba_scan_fused(u, dt, z, A, B, C, D, dt_bias,
                     chunk_size=DEF_CHUNK, d_block=DEF_DBLOCK):
    """out = (scan(u, softplus(dt+bias), A, B, C) + D·u) · silu(z).

    u/dt/z: (batch, L, dim) storage dtype; B/C: (batch, L, N).
    Parameters may be shared — A: (dim, N), D/dt_bias: (dim,) — or
    per-batch-row — A: (batch, dim, N), D/dt_bias: (batch, dim) — which lets
    callers fold independent branches (e.g. the three scan orientations)
    into one batched kernel call. Returns (batch, L, dim) in u.dtype.
    """
    batch, seqlen, dim = u.shape
    dstate = A.shape[1]
    T = min(chunk_size, _round_up(seqlen, 8))
    if T < 128 and _round_up(seqlen, 8) > T:
        # Mosaic requires blocked trailing dims to be multiples of 128 and
        # B/C carry time on lanes; sub-128 chunks are only legal when the
        # whole (padded) sequence is a single chunk.
        T = min(128, _round_up(seqlen, 8))
    Dblk = _pick_dblock(dim, d_block)
    pad_l = (-seqlen) % T
    pad_d = (-dim) % Dblk

    def padded(arr, dims):
        pads = [(0, 0)] * arr.ndim
        for ax, p in dims:
            pads[ax] = (0, p)
        return jnp.pad(arr, pads) if any(p for _, p in dims) else arr

    # NOTE: dt pads with zeros; softplus(0 + bias) > 0 but the padded u is
    # zero so b=0, and a>0 only decays the (zero) padded state — harmless;
    # padded outputs are sliced off and padded grads never flow back.
    uf = padded(u, [(1, pad_l), (2, pad_d)])
    dtf = padded(dt, [(1, pad_l), (2, pad_d)])
    zf = padded(z, [(1, pad_l), (2, pad_d)])
    Bf = padded(B, [(1, pad_l)])
    Cf = padded(C, [(1, pad_l)])

    # canonicalize parameters to (G, ...) — G=1 shared, G=batch per-batch
    # (per-batch lets e.g. the three tri-orientation branches run as one
    # batched kernel call with their own A/D/bias per group)
    if A.ndim == 2:
        At3 = padded(A.astype(jnp.float32), [(0, pad_d)]).T[None]  # (1,N,Dp)
        bias3 = padded(dt_bias.astype(jnp.float32).reshape(1, 1, dim),
                       [(2, pad_d)])
        Dv3 = padded(D.astype(jnp.float32).reshape(1, 1, dim), [(2, pad_d)])
    else:
        assert A.shape[0] == batch, "per-batch A must have leading batch dim"
        At3 = jnp.swapaxes(padded(A.astype(jnp.float32), [(1, pad_d)]), 1, 2)
        bias3 = padded(dt_bias.astype(jnp.float32).reshape(batch, 1, dim),
                       [(2, pad_d)])
        Dv3 = padded(D.astype(jnp.float32).reshape(batch, 1, dim),
                     [(2, pad_d)])

    core = _make_core(T, Dblk)
    out = core(uf, dtf, zf, At3, jnp.swapaxes(Bf, 1, 2),
               jnp.swapaxes(Cf, 1, 2), bias3, Dv3)
    return out[:, :seqlen, :dim]
