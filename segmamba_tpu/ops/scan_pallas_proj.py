"""Projection-fused gated selective scan (Pallas TPU): one pass over xc.

The reference's hot op ``MambaInnerFnNoOutProj`` fuses causal-conv1d +
x_proj matmul + dt projection + selective scan into ONE autograd node
(/root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:155-289);
our previous decomposition kept the projections as XLA einsums feeding the
direction-aware scan kernel (scan_pallas_dir.py). Measured at the SegMamba
stage-0 shape that splits the scan path into ~7 HBM passes per direction:
read xc, write x_dbl, read x_dbl, write dt, then the kernel reads
u(=xc)/dt/z and writes out. This kernel moves the projections INTO the scan
program, so per direction the only large HBM traffic is: read xc once,
write the output once —

    x_dbl = xc @ [W_dt | W_B | W_C]        (MXU, weights resident in VMEM)
    delta = softplus(x_dbl_dt @ dtp + bias)
    x[t]  = exp(delta A) x[t-1] + delta B[t] xc[t]     (direction-aware)
    out   = C[t].x[t] + D xc[t]  [+ acc]  [* silu(z)]

``acc``/``z`` make the three scan orientations a CHAIN: the slice and
reverse orientations emit ungated partial sums, the forward orientation
adds them and applies the shared silu(z) gate once — z is read once per
MambaLayer instead of once per direction, and the two partial-output adds
disappear into the kernels.

The backward is the same recompute strategy as the other kernels (per-chunk
exit states saved forward, in-chunk states re-derived; the CUDA backward's
approach, selective_scan_bwd_kernel.cuh) but also backpropagates the
projections in-kernel: it emits ONE large gradient (dxc) plus small weight
accumulators, replacing the unfused path's du/ddt f32 buffers and the
(nd, R, N, L) dB/dC partial buffers entirely.

Constraint: d_inner <= 128 (the channel dim must fit one lane block so the
projections see all channels). Callers fall back to scan_pallas_dir above.

MEASURED OUTCOME (benchmarks/bench_proj.py, v5e, stage-0 shape): 12.46 ms
vs 11.68 ms for the unfused dir path forward, 39.6 vs 37.2 ms backward —
exact but ~6% SLOWER. The scan kernels are VPU-bound (exp generation +
elementwise; see the bench_scan_lb floor probe), so the HBM passes this
fusion removes were never the bottleneck, while the per-chunk MXU
projections serialize onto the VPU critical path. Kept as ``scan_impl=
"proj"`` opt-in: it still eliminates the backward's (nd, R, N, L) dB/dC
HBM buffers, which matters when training memory (not step time) binds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segmamba_tpu.ops.scan_pallas import (
    DEF_CHUNK,
    _hs_fwd_b,
    _hs_rev_v,
    _interpret,
    _round_up,
    _shift_down_ax,
    _shift_up_ax,
)

def _mxin(x):
    """MXU matmul operand: keep storage dtype on TPU (bf16 x bf16 -> f32 is
    the native MXU mode); upcast in interpret mode (XLA:CPU's dot thunk
    rejects mixed bf16->f32)."""
    return x.astype(jnp.float32) if _interpret() else x


def _proj_fwd_kernel(reverse, gate, has_acc, *refs):
    """One (batch, chunk) grid step of the projection-fused forward."""
    (xc_ref, wdt_ref, wb_ref, wc_ref, dtp_ref, bias_ref, At_ref, Dv_ref,
     *rest) = refs
    pos = 0
    z_ref = rest[pos] if gate else None
    pos += 1 if gate else 0
    acc_ref = rest[pos] if has_acc else None
    pos += 1 if has_acc else 0
    out_ref, st_ref, carry_ref = rest[pos:]

    T = xc_ref.shape[1]
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

    u = xc_ref[0].astype(jnp.float32)                       # (T, D)
    # projections on the MXU; weights stay resident in VMEM across chunks
    xcl = _mxin(xc_ref[0])
    xdt = jnp.dot(xcl, _mxin(wdt_ref[...]),
                  preferred_element_type=jnp.float32)       # (T, RP)
    Btn = jnp.dot(xcl, _mxin(wb_ref[...]),
                  preferred_element_type=jnp.float32)       # (T, N)
    Ctn = jnp.dot(xcl, _mxin(wc_ref[...]),
                  preferred_element_type=jnp.float32)
    dt_raw = (jnp.dot(xdt, _mxin(dtp_ref[...]),
                      preferred_element_type=jnp.float32)
              + bias_ref[...].astype(jnp.float32))          # (T, D)
    delta = jax.nn.softplus(dt_raw)
    At = At_ref[...].astype(jnp.float32)                    # (N, D)

    # (T, N, D) layout: time on the LEADING axis so the Hillis-Steele
    # shifts are tile re-indexing rather than sublane moves, and the
    # (T, N) projection outputs broadcast without any in-kernel transpose
    a = jnp.exp(delta[:, None, :] * At[None])               # (T, N, D)
    bmat = (delta * u)[:, None, :] * Btn[:, :, None]
    carry = carry_ref[...][None]
    if reverse:
        bs = jnp.concatenate(
            [bmat[:T - 1], bmat[T - 1:] + a[T - 1:] * carry], axis=0)
        x = _hs_rev_v(a, bs, T, axis=0)
        ncarry = x[0:1]
    else:
        bs = jnp.concatenate(
            [bmat[0:1] + a[0:1] * carry, bmat[1:]], axis=0)
        x = _hs_fwd_b(a, bs, T, axis=0)
        ncarry = x[T - 1:T]
    y = jnp.sum(Ctn[:, :, None] * x, axis=1)
    y = y + Dv_ref[...].astype(jnp.float32) * u
    if has_acc:
        y = y + acc_ref[0].astype(jnp.float32)
    if gate:
        z = z_ref[0].astype(jnp.float32)
        y = y * (z * jax.nn.sigmoid(z))
    out_ref[0] = y.astype(out_ref.dtype)

    N, D = carry_ref.shape
    carry_ref[...] = ncarry.reshape(N, D)
    st_ref[0, 0] = carry_ref[...]


def _proj_bwd_kernel(reverse, gate, has_acc, *refs):
    (xc_ref, wdt_ref, wb_ref, wc_ref, dtp_ref, bias_ref, At_ref, Dv_ref,
     *rest) = refs
    pos = 0
    z_ref = rest[pos] if gate else None
    pos += 1 if gate else 0
    acc_ref = rest[pos] if has_acc else None
    pos += 1 if has_acc else 0
    dout_ref, ent_ref = rest[pos:pos + 2]
    outs = rest[pos + 2:]
    dxc_ref = outs[0]
    pos2 = 1
    dz_ref = outs[pos2] if gate else None
    pos2 += 1 if gate else 0
    dacc_ref = outs[pos2] if (has_acc and gate) else None
    pos2 += 1 if (has_acc and gate) else 0
    (dwdt_ref, dwb_ref, dwc_ref, ddtp_ref, dbias_ref, dA_ref, dD_ref,
     gcarry_ref) = outs[pos2:]

    T = xc_ref.shape[1]
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        gcarry_ref[...] = jnp.zeros(gcarry_ref.shape, gcarry_ref.dtype)
        for r in (dwdt_ref, dwb_ref, dwc_ref, ddtp_ref, dbias_ref, dA_ref,
                  dD_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    u = xc_ref[0].astype(jnp.float32)
    wdt = wdt_ref[...].astype(jnp.float32)
    wb = wb_ref[...].astype(jnp.float32)
    wc = wc_ref[...].astype(jnp.float32)
    dtp = dtp_ref[...].astype(jnp.float32)
    xcl = _mxin(xc_ref[0])
    xdt = jnp.dot(xcl, _mxin(wdt_ref[...]),
                  preferred_element_type=jnp.float32)       # (T, RP)
    Btn = jnp.dot(xcl, _mxin(wb_ref[...]),
                  preferred_element_type=jnp.float32)
    Ctn = jnp.dot(xcl, _mxin(wc_ref[...]),
                  preferred_element_type=jnp.float32)
    dt_raw = (jnp.dot(xdt, _mxin(dtp_ref[...]),
                      preferred_element_type=jnp.float32)
              + bias_ref[...].astype(jnp.float32))
    delta = jax.nn.softplus(dt_raw)
    At = At_ref[...].astype(jnp.float32)
    Dv = Dv_ref[...].astype(jnp.float32)
    dout = dout_ref[0].astype(jnp.float32)

    a = jnp.exp(delta[:, None, :] * At[None])               # (T, N, D)
    du_ = delta * u
    bmat = du_[:, None, :] * Btn[:, :, None]
    entry = ent_ref[0, 0].astype(jnp.float32)[None]
    entry = jnp.where(c == nc - 1, jnp.zeros_like(entry), entry)

    if reverse:
        bs = jnp.concatenate(
            [bmat[:T - 1], bmat[T - 1:] + a[T - 1:] * entry], axis=0)
        x = _hs_rev_v(a, bs, T, axis=0)
        x_prev = jnp.concatenate([x[1:], entry], axis=0)
    else:
        bs = jnp.concatenate(
            [bmat[0:1] + a[0:1] * entry, bmat[1:]], axis=0)
        x = _hs_fwd_b(a, bs, T, axis=0)
        x_prev = jnp.concatenate([entry, x[0:T - 1]], axis=0)

    if gate:
        y = jnp.sum(Ctn[:, :, None] * x, axis=1) + Dv * u
        if has_acc:
            y = y + acc_ref[0].astype(jnp.float32)
        z = z_ref[0].astype(jnp.float32)
        sig = jax.nn.sigmoid(z)
        silu = z * sig
        dy = dout * silu
        dz_ref[0] = (dout * y * (sig + silu * (1.0 - sig))).astype(
            dz_ref.dtype)
        if has_acc:
            dacc_ref[0] = dy.astype(dacc_ref.dtype)
    else:
        dy = dout

    dD_ref[...] += jnp.sum(dy * u, axis=0, keepdims=True)

    dx = Ctn[:, :, None] * dy[:, None, :]
    N, D = gcarry_ref.shape
    gcarry = gcarry_ref[...][None]
    zpad = jnp.zeros((T - 1,) + dx.shape[1:], jnp.float32)
    if reverse:
        m = _shift_down_ax(a, 1, 1.0, 0)
        g = _hs_fwd_b(m, dx + jnp.concatenate([gcarry, zpad], axis=0), T,
                      axis=0)
        ngcarry = a[T - 1:T] * g[T - 1:T]
    else:
        m = _shift_up_ax(a, 1, 1.0, 0)
        g = _hs_rev_v(m, dx + jnp.concatenate([zpad, gcarry], axis=0), T,
                      axis=0)
        ngcarry = a[0:1] * g[0:1]
    gcarry_ref[...] = ngcarry.reshape(N, D)

    dp = g * x_prev * a
    S = jnp.sum(g * Btn[:, :, None], axis=1)                # (T, D)
    ddelta = jnp.sum(dp * At[None], axis=1) + S * u
    ddt_raw = ddelta * jax.nn.sigmoid(dt_raw)               # (T, D)
    dB_tn = jnp.sum(g * du_[:, None, :], axis=2)            # (T, N)
    dC_tn = jnp.sum(x * dy[:, None, :], axis=2)

    # back through the projections (all contractions stay on the MXU;
    # DEFAULT precision truncates f32 operands to bf16 like the unfused
    # path's bf16 einsums did — same numeric tier, 3x fewer MXU passes)
    dd = lambda x, y, dims: jax.lax.dot_general(
        x, y, (dims, ((), ())),
        preferred_element_type=jnp.float32)
    dxdt = dd(ddt_raw, dtp, (((1,), (1,))))                 # (T, RP)
    dxc = (S * delta + dy * Dv
           + dd(dxdt, wdt, (((1,), (1,))))
           + dd(dB_tn, wb, (((1,), (1,))))
           + dd(dC_tn, wc, (((1,), (1,)))))                 # (T, D)
    dxc_ref[0] = dxc.astype(dxc_ref.dtype)

    dwdt_ref[...] += dd(u, dxdt, (((0,), (0,))))            # (D, RP)
    dwb_ref[...] += dd(u, dB_tn, (((0,), (0,))))            # (D, N)
    dwc_ref[...] += dd(u, dC_tn, (((0,), (0,))))
    ddtp_ref[...] += dd(xdt, ddt_raw, (((0,), (0,))))       # (RP, D)
    dbias_ref[...] += jnp.sum(ddt_raw, axis=0, keepdims=True)
    dA_ref[...] += jnp.sum(dp * delta[:, None, :], axis=0)  # (N, D)


def _proj_fwd_call(xc, wdt, wb, wc, dtp, bias, At, Dv, z, acc, T, reverse,
                   gate):
    b, L, D = xc.shape
    N = At.shape[0]
    RP = wdt.shape[1]
    nc = L // T
    has_acc = acc is not None

    def pc(c):
        return nc - 1 - c if reverse else c

    seq_spec = pl.BlockSpec((1, T, D), lambda b, c: (b, pc(c), 0))
    full = lambda *shape: pl.BlockSpec(shape, lambda b, c: (0,) * len(shape))
    in_specs = [seq_spec, full(D, RP), full(D, N), full(D, N), full(RP, D),
                full(1, D), full(N, D), full(1, D)]
    args = [xc, wdt, wb, wc, dtp, bias, At, Dv]
    if gate:
        in_specs.append(seq_spec)
        args.append(z)
    if has_acc:
        in_specs.append(seq_spec)
        args.append(acc)
    out, states = pl.pallas_call(
        functools.partial(_proj_fwd_kernel, reverse, gate, has_acc),
        grid=(b, nc),
        in_specs=in_specs,
        out_specs=[
            seq_spec,
            pl.BlockSpec((1, 1, N, D), lambda b, c: (b, pc(c), 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, L, D), xc.dtype),
            jax.ShapeDtypeStruct((b, nc, N, D), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, D), jnp.float32)],
        interpret=_interpret(),
    )(*args)
    return out, states


def _proj_bwd_call(xc, wdt, wb, wc, dtp, bias, At, Dv, z, acc, dout, states,
                   T, reverse, gate):
    b, L, D = xc.shape
    N = At.shape[0]
    RP = wdt.shape[1]
    nc = L // T
    has_acc = acc is not None

    def pc(c):
        return nc - 1 - c if reverse else c

    def rv(c):
        return nc - 1 - c  # bwd walks virtual chunks last-to-first

    seq_spec = pl.BlockSpec((1, T, D), lambda b, c: (b, pc(rv(c)), 0))
    full = lambda *shape: pl.BlockSpec(shape, lambda b, c: (0,) * len(shape))
    accum = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda b, c: (b,) + (0,) * len(shape))
    in_specs = [seq_spec, full(D, RP), full(D, N), full(D, N), full(RP, D),
                full(1, D), full(N, D), full(1, D)]
    args = [xc, wdt, wb, wc, dtp, bias, At, Dv]
    if gate:
        in_specs.append(seq_spec)
        args.append(z)
    if has_acc:
        in_specs.append(seq_spec)
        args.append(acc)
    # forward saves the state INDEXED BY PHYSICAL chunk (pc(c)); entry of
    # virtual chunk v is the exit of virtual chunk v-1 = physical pc(v-1)
    in_specs.append(pl.BlockSpec(
        (1, T, D), lambda b, c: (b, pc(rv(c)), 0)))          # dout
    in_specs.append(pl.BlockSpec(
        (1, 1, N, D),
        lambda b, c: (b, pc(jnp.maximum(rv(c) - 1, 0)), 0, 0)))  # entry
    args += [dout, states]

    out_specs = [seq_spec]
    out_shape = [jax.ShapeDtypeStruct((b, L, D), jnp.float32)]   # dxc
    if gate:
        out_specs.append(seq_spec)
        out_shape.append(jax.ShapeDtypeStruct((b, L, D), jnp.float32))  # dz
        if has_acc:
            out_specs.append(seq_spec)
            out_shape.append(
                jax.ShapeDtypeStruct((b, L, D), jnp.float32))  # dacc
    for shape in ((D, RP), (D, N), (D, N), (RP, D), (1, D), (N, D), (1, D)):
        out_specs.append(accum(*shape))
        out_shape.append(jax.ShapeDtypeStruct((b,) + shape, jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_proj_bwd_kernel, reverse, gate, has_acc),
        grid=(b, nc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((N, D), jnp.float32)],
        interpret=_interpret(),
    )(*args)
    outs = list(outs)
    dxc = outs.pop(0)
    dz = outs.pop(0) if gate else None
    dacc = outs.pop(0) if (gate and has_acc) else (dout if has_acc else None)
    dwdt, dwb, dwc, ddtp, dbias, dA, dD = (jnp.sum(o, axis=0) for o in outs)
    return dxc, dz, dacc, dwdt, dwb, dwc, ddtp, dbias, dA, dD


@functools.lru_cache(maxsize=None)
def _make_proj_core(T, reverse, gate, has_acc):
    @jax.custom_vjp
    def core(xc, wdt, wb, wc, dtp, bias, At, Dv, z, acc):
        out, _ = _proj_fwd_call(xc, wdt, wb, wc, dtp, bias, At, Dv,
                                z if gate else None, acc if has_acc else None,
                                T, reverse, gate)
        return out

    def core_fwd(xc, wdt, wb, wc, dtp, bias, At, Dv, z, acc):
        out, states = _proj_fwd_call(
            xc, wdt, wb, wc, dtp, bias, At, Dv, z if gate else None,
            acc if has_acc else None, T, reverse, gate)
        return out, (xc, wdt, wb, wc, dtp, bias, At, Dv, z, acc, states)

    def core_bwd(res, dout):
        xc, wdt, wb, wc, dtp, bias, At, Dv, z, acc, states = res
        dxc, dz, dacc, dwdt, dwb, dwc, ddtp, dbias, dA, dD = _proj_bwd_call(
            xc, wdt, wb, wc, dtp, bias, At, Dv, z if gate else None,
            acc if has_acc else None, dout.astype(jnp.float32), states, T,
            reverse, gate)
        return (dxc.astype(xc.dtype), dwdt.astype(wdt.dtype),
                dwb.astype(wb.dtype), dwc.astype(wc.dtype),
                ddtp.astype(dtp.dtype), dbias.astype(bias.dtype),
                dA.astype(At.dtype), dD.astype(Dv.dtype),
                dz.astype(z.dtype) if gate else jnp.zeros_like(z),
                (dacc.astype(acc.dtype) if has_acc
                 else jnp.zeros_like(acc)))

    core.defvjp(core_fwd, core_bwd)
    return core


def proj_scan_supported(d_inner):
    """The projections need the whole channel dim in one lane block."""
    return d_inner <= 128


def mamba_scan_proj(xc, x_proj, dt_proj, dt_bias, A, D_skip, *, z=None,
                    acc=None, reverse=False, chunk_size=DEF_CHUNK):
    """Projection-fused direction-aware gated scan.

    Args:
      xc:      (batch, L, d_inner) conv output (post-silu), storage dtype.
      x_proj:  (d_inner, dt_rank + 2*d_state) combined projection
               (reference x_proj_weight, selective_scan_interface.py:181).
      dt_proj: (dt_rank, d_inner); dt_bias: (d_inner,) f32.
      A:       (d_inner, d_state) negative real; D_skip: (d_inner,).
      z:       optional (batch, L, d_inner) gate input. When given the
               output is ``(y [+ acc]) * silu(z)``; when None the raw
               partial sum ``y [+ acc]`` is returned (for chaining).
      acc:     optional (batch, L, d_inner) accumulator added to y.
      reverse: scan right-to-left IN PLACE (no flipped copy; the kernel
               walks chunks through reversed index maps).
    Returns:
      (batch, L, d_inner) in xc.dtype.
    """
    b, L, d_inner = xc.shape
    if not proj_scan_supported(d_inner):
        raise ValueError(f"d_inner={d_inner} > 128; use scan_pallas_dir")
    d_state = A.shape[1]
    dt_rank = x_proj.shape[1] - 2 * d_state

    T = min(chunk_size, _round_up(L, 8))
    if T < 128 and _round_up(L, 8) > T:
        T = min(128, _round_up(L, 8))
    pad_l = (-L) % T
    # zero-padded timesteps are exact: xc=0 => x_dbl=0 => B=C=0 and b=0, so
    # states pass through scaled only, and all pad-region gradients vanish
    # (see scan_pallas_dir's padding note; outputs are cropped below)
    if pad_l:
        pads = ((0, 0), (0, pad_l), (0, 0))
        xc = jnp.pad(xc, pads)
        if z is not None:
            z = jnp.pad(z, pads)
        if acc is not None:
            acc = jnp.pad(acc, pads)

    # pad dt_rank to 8 sublanes (zero rows/cols are exact pass-throughs)
    RP = max(8, _round_up(dt_rank, 8))
    wdt = x_proj[:, :dt_rank]
    if RP != dt_rank:
        wdt = jnp.pad(wdt, ((0, 0), (0, RP - dt_rank)))
        dtp = jnp.pad(dt_proj, ((0, RP - dt_rank), (0, 0)))
    else:
        dtp = dt_proj
    wb = x_proj[:, dt_rank:dt_rank + d_state]
    wc = x_proj[:, dt_rank + d_state:]

    gate = z is not None
    has_acc = acc is not None
    core = _make_proj_core(T, bool(reverse), gate, has_acc)
    out = core(xc, wdt, wb, wc, dtp.astype(jnp.float32),
               dt_bias.astype(jnp.float32).reshape(1, d_inner),
               jnp.swapaxes(A.astype(jnp.float32), 0, 1),
               D_skip.astype(jnp.float32).reshape(1, d_inner),
               z if gate else jnp.zeros_like(xc),
               acc if has_acc else jnp.zeros_like(xc))
    return out[:, :L] if pad_l else out
